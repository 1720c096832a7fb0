"""Golden-output test of the full reference pipeline (SURVEY.md §5.2(2)):
a synthetic SIGA-shaped fixture through ``siga_pipeline``, asserting the
star-schema quirk semantics — dense ids from 1, first-wins dedup, ``-1``
missing FKs, ``0`` missing date keys, ``"N/A"`` defaults, comma-decimal
2-dp measures, calendar min..max inclusive."""

from __future__ import annotations

import pytest

from java_etl_bi_generator_spark.operators.star import siga_pipeline

ROWS = [
    # CodCEG, Nome, TipoGer, Origem, Fonte, Fase, Outorga, Qualif, UF, Mun,
    # DataOp, PotOut, PotFisc, GarFis, Regime
    ("CEG.1", "Usina São João", "UHE", "Hídrica", "Potencial hidráulico",
     "Operação", "Concessão", "Sim", "MG", "Três Marias",
     "2001-03-15", "1.234,56", "1.200,00", "980,5", "100% X (REG)"),
    ("CEG.2", "Parque Eólico Ventania", "EOL", "Eólica", "Cinética do vento",
     "Operação", "Autorização", "", "RS", "Osório",
     "2014-07-01 00:00:00", "30000", "29.500,25", "", "100% Y (PIE)"),
    # duplicate CodCEG — first wins for dim_empreendimento
    ("CEG.1", "Usina São João II", "UHE", "Hídrica", "Potencial hidráulico",
     "Construção", "Concessão", "Não", "MG", "Três Marias",
     "bad-date", "0,5", "", "abc", "50% X (REG)"),
]

COLS = (
    "CodCEG NomEmpreendimento SigTipoGeracao DscOrigemCombustivel "
    "DscFonteCombustivel DscFaseUsina DscTipoOutorga IdcGeracaoQualificada "
    "SigUFPrincipal DscMuninicpios DatEntradaOperacao MdaPotenciaOutorgadaKw "
    "MdaPotenciaFiscalizadaKw MdaGarantiaFisicaKw DscPropriRegimePariticipacao"
).split()


@pytest.fixture(scope="module")
def outputs(spark):
    src = spark.createDataFrame(ROWS, COLS)
    return siga_pipeline(spark, src)


def test_dim_geracao_dense_ids(outputs):
    rows = {
        (r["SigTipoGeracao"], r["ID_Geracao"])
        for r in outputs.dim_geracao.collect()
    }
    assert rows == {("EOL", 1), ("UHE", 2)}  # ordered by natural key


def test_dim_status_na_default(outputs):
    vals = {r["IdcGeracaoQualificada"] for r in outputs.dim_status.collect()}
    assert "N/A" in vals and "" not in vals  # FullETLGenerator.java:206-209


def test_dim_empreendimento_first_wins(outputs):
    rows = {r["CodCEG"]: r["NomEmpreendimento"]
            for r in outputs.dim_empreendimento.collect()}
    assert len(rows) == 2
    assert rows["CEG.1"] == "Usina São João"  # deterministic winner


def test_dim_tempo_inclusive_no_gaps(outputs):
    days = outputs.dim_tempo.collect()
    assert days[0] is not None
    keys = sorted(r["ChaveData"] for r in days)
    assert keys[0] == 20010315 and keys[-1] == 20140701
    # inclusive day count, no gaps/dups
    import datetime

    n = (datetime.date(2014, 7, 1) - datetime.date(2001, 3, 15)).days + 1
    assert len(days) == len(set(keys)) == n
    by_key = {r["ChaveData"]: r for r in days}
    assert by_key[20010315]["Trimestre"] == "T1"
    assert by_key[20010315]["NomeMes"] == "março"


def test_fact_quirks(outputs):
    facts = outputs.fato_geracao.collect()
    assert len(facts) == 3  # grain = 1 row per source row
    by_pot = {r["MdaPotenciaOutorgadaKw"]: r for r in facts}
    assert set(by_pot) == {"1234,56", "30000,00", "0,50"}  # comma 2-dp
    bad = by_pot["0,50"]
    assert bad["FK_DataOperacao"] == 0        # unparseable date -> 0 (:252)
    assert bad["MdaGarantiaFisicaKw"] == "0,00"  # malformed -> 0.0 (:236-238)
    assert all(r["QtdEmpreendimentos"] == 1 for r in facts)
    assert all(r["ID_Geracao"] > 0 for r in facts)  # all keys resolve here


def test_fact_missing_dim_is_minus_one(spark, outputs):
    """A fact row whose key misses the dim gets -1 (FullETLGenerator.java:168-170)."""
    from java_etl_bi_generator_spark.operators.star import DimSpec, build_fact
    import pyspark.sql.functions as F

    src = spark.createDataFrame([("X",), ("Y",)], ["k"])
    dim = spark.createDataFrame([(1, "X")], ["dim_id", "k"])
    out = build_fact(src, [DimSpec(dim, ["k"], "dim_id")],
                     passthrough=[F.col("k")])
    got = {r["k"]: r["dim_id"] for r in out.collect()}
    assert got == {"X": 1, "Y": -1}
