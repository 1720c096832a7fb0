#!/usr/bin/env python
"""End-to-end reference-parity example: the complete
``FullETLGenerator.java`` pipeline on this engine.

A user of the reference runs::

    java FullETLGenerator  # reads dados/siga-*.csv, writes 6 CSVs

The equivalent here (this script, runnable standalone)::

    python examples/siga_etl.py [input.csv] [output_dir]

Without arguments it synthesizes a small SIGA-shaped CSV first (the real
ANEEL dataset is not redistributable), then runs the pipeline and writes
the same six star-schema tables in the same `;`-delimited ISO-8859-1
dialect: dim_geracao, dim_status, dim_localizacao, dim_empreendimento,
dim_tempo, fato_geracao (schemas per SURVEY.md §1.4, quirks included:
dense surrogate ids, first-wins dedup, -1/0 sentinel keys, "N/A"
defaults, comma-decimal 2-dp measures).
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from java_etl_bi_generator_spark.operators.star import siga_pipeline
from java_etl_bi_generator_spark.session import get_spark
from java_etl_bi_generator_spark.sources.csv_ref import (
    read_reference_csv,
    write_reference_csv,
)

COLUMNS = (
    "CodCEG;NomEmpreendimento;SigTipoGeracao;DscOrigemCombustivel;"
    "DscFonteCombustivel;DscFaseUsina;DscTipoOutorga;IdcGeracaoQualificada;"
    "SigUFPrincipal;DscMuninicpios;DatEntradaOperacao;MdaPotenciaOutorgadaKw;"
    "MdaPotenciaFiscalizadaKw;MdaGarantiaFisicaKw;DscPropriRegimePariticipacao"
)


def synthesize_input(path: str, n: int = 2000) -> None:
    rng = random.Random(42)
    tipos = ["UHE", "PCH", "CGH", "EOL", "UFV", "UTE", "UTN"]
    origens = ["Hídrica", "Eólica", "Solar", "Fóssil", "Biomassa", "Nuclear"]
    fases = ["Operação", "Construção", "Construção não iniciada"]
    outorgas = ["Concessão", "Autorização", "Registro"]
    ufs = ["SP", "MG", "RS", "BA", "PR", "SC", "GO", "CE"]
    with open(path, "w", encoding="ISO-8859-1") as f:
        f.write(COLUMNS + "\n")
        for i in range(n):
            ceg = f"GER.{rng.randrange(n * 9 // 10):06d}"  # ~10% dup CodCEG
            t = rng.choice(tipos)
            date = (
                f"{rng.randrange(1990, 2026)}-{rng.randrange(1, 13):02d}-"
                f"{rng.randrange(1, 29):02d}"
            )
            if rng.random() < 0.05:
                date = ""  # exercises the null/0 date paths
            pot = f"{rng.randrange(1, 2000)}.{rng.randrange(100, 999)},{rng.randrange(10, 99)}"
            f.write(
                f"{ceg};Usina São {i};{t};{rng.choice(origens)};Fonte {t};"
                f"{rng.choice(fases)};{rng.choice(outorgas)};"
                f"{rng.choice(['Sim', 'Não', ''])};{rng.choice(ufs)};"
                f"Município {i % 300};{date};{pot};{pot};;100% Empresa {i} (REG)\n"
            )


def main() -> None:
    src_csv = sys.argv[1] if len(sys.argv) > 1 else "/tmp/siga_synthetic.csv"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/siga_star_out"
    if len(sys.argv) < 2:
        synthesize_input(src_csv)
        print(f"synthesized input at {src_csv}")

    spark = get_spark(app_name="siga-etl")
    schema = ", ".join(f"{c} string" for c in COLUMNS.split(";"))
    src = read_reference_csv(spark, src_csv, schema)

    out = siga_pipeline(spark, src)
    tables = {
        "dim_geracao": out.dim_geracao,
        "dim_status": out.dim_status,
        "dim_localizacao": out.dim_localizacao,
        "dim_empreendimento": out.dim_empreendimento,
        "fato_geracao": out.fato_geracao,
    }
    if out.dim_tempo is not None:
        tables["dim_tempo"] = out.dim_tempo
    for name, df in tables.items():
        write_reference_csv(df, f"{out_dir}/{name}")
        print(f"{name}: {df.count()} rows -> {out_dir}/{name}")


if __name__ == "__main__":
    main()
