"""Shared literals + hex-layout generators for the media header roundtrip.

Closes the one SURVEY §2.12 gap the round-4 verdict flagged: multimodal
(L5) had no oracle-checked query because the driver testdata carries no
binary column.  The fix is to make the ENGINE write the binary fixture:
``q_media_header_roundtrip`` synthesizes minimal-but-valid PNG / GIF /
WAV byte streams from ``doc_id``-derived parameters, writes them to
parquet as a real ``binary`` column, reads them back, and parses the
headers with the existing codegen parsers (sources/multimodal.py
``image_header_dims`` / ``audio_header_meta``).  The DuckDB oracle
builds the SAME blob hex from the SAME parameters and then re-derives
every field with fixed-offset arithmetic OVER THE HEX (nibble
`strpos` parses, the `_hex_bigint` discipline) — so the hash-check
proves three things at once: the construction is deterministic, the
parquet binary roundtrip is byte-identical (the emitted ``blob_hex``
column), and the header parsers' offset arithmetic is correct.

Both queries.py and oracles.py import THIS module, so the container
magic bytes, the parameter derivations, and the little/big-endian
field encodings are single-sourced — the cross-engine match is by
construction, not by parallel maintenance (the resample.py /
linkage.py idiom).

Layouts (1-based byte offsets, matching the parsers):
  PNG  (33 B): sig 8 | IHDR len be32=13 | "IHDR" | width be32 @17 |
               height be32 @21 | bit-depth/color/comp/filter/interlace
               08 06 00 00 00 | CRC 4 (unchecked by header parsers)
  GIF  (13 B): "GIF89a" | width le16 @7 | height le16 @9 |
               packed/bg/aspect 00 00 00
  WAV  (44 B): "RIFF" | riff_size le32 | "WAVE" | "fmt " | 16 le32 |
               PCM=1 le16 | channels le16 @23 | rate le32 @25 |
               byte_rate le32 | block_align le16 | bits le16 @35 |
               "data" | data_bytes le32 @41  (header only — the
               declared data size is the duration source of truth,
               per sources/multimodal.py wav_chunk_meta)
"""

from __future__ import annotations

# Container magic bytes as lowercase hex (bytes.hex() of the ASCII/ sig
# literals — written out so the module is import-cheap and grep-able).
PNG_SIG_HEX = "89504e470d0a1a0a"  # b"\x89PNG\r\n\x1a\n"
IHDR_HEX = "49484452"  # b"IHDR"
PNG_TAIL_HEX = "0806000000" + "00000000"  # depth 8, RGBA, + dummy CRC
GIF_SIG_HEX = "474946383961"  # b"GIF89a"
GIF_TAIL_HEX = "000000"  # packed=0 (no GCT), bg=0, aspect=0
RIFF_HEX = "52494646"  # b"RIFF"
WAVE_HEX = "57415645"  # b"WAVE"
FMT_HEX = "666d7420"  # b"fmt "
DATA_HEX = "64617461"  # b"data"

# Parameter derivations (pure integer functions of doc_id; multipliers
# coprime to the moduli so the small-SF fixture already exercises many
# distinct dims).  WAV bits stay multiples of 8 so byte_rate and
# block_align are exact integers.
PNG_W = "16 + (doc_id * 37) % 4080"
PNG_H = "16 + (doc_id * 61) % 2160"
GIF_W = "16 + (doc_id * 37) % 60000"
GIF_H = "16 + (doc_id * 61) % 60000"
WAV_CH = "1 + doc_id % 2"
WAV_RATES = [8000, 16000, 22050, 44100, 48000]  # index doc_id % 5
WAV_BITS = [8, 16, 32]  # index (doc_id % 7) % 3
WAV_DATA = "1000 + (doc_id * 97) % 100000"


# -- WAVE_FORMAT_EXTENSIBLE canonical fixture (round 9, VERDICT r8
# task 3: promote the general RIFF walk the way MP4/JPEG were
# promoted).  The NON-CANONICAL layouts audio_meta_arrow exists for —
# a LIST/INFO chunk BEFORE ``fmt ``, and the 40-byte
# WAVE_FORMAT_EXTENSIBLE fmt — written as ONE fixed layout so every
# field sits at a constant offset and the parse runs in whole-stage
# codegen.  Layout (1-based byte offsets):
#   "RIFF" @1 | riff_size le32 @5 (= data_size + 94) | "WAVE" @9
#   "LIST" @13 | 26 le32 @17 | "INFO" @21 | "ISFT" @25 | 14 le32 @29
#   | "extensible-wav" @33 (14 B, even — no pad byte)
#   "fmt " @47 | 40 le32 @51 | 0xFFFE le16 @55 | channels le16 @57
#   | rate le32 @59 | byte_rate le32 @63 | block_align le16 @67
#   | container bits le16 @69 | cbSize=22 le16 @71 | valid_bits le16
#   @73 | channel_mask le32 @75 | PCM subformat GUID (16 B) @79
#   "data" @95 | data_size le32 @99 | zero payload @103
LIST_HEX = "4c495354"  # b"LIST"
INFO_ISFT_HEX = (
    "494e464f" "49534654" "0e000000" "657874656e7369626c652d776176"
)  # "INFO" + "ISFT" + le32(14) + b"extensible-wav"
WAVEXT_FMT_HEX = "666d7420" "28000000" "feff"  # "fmt " + le32(40) + 0xFFFE
WAVEXT_CBSIZE_HEX = "1600"  # le16(22)
PCM_GUID_HEX = "0100000000001000800000aa00389b71"  # KSDATAFORMAT PCM

# doc_id-derived parameters (bits multiples of 8 so block_align and
# byte_rate are exact integers; frames bounded at 48 so blob_hex stays
# ~1 KB per row at any SF).
WAVEXT_CH = "1 + doc_id % 3"
WAVEXT_BITS = "16 + 8 * (doc_id % 3)"
WAVEXT_VALID = f"({WAVEXT_BITS}) - 4 * (doc_id % 2)"
WAVEXT_FRAMES = "1 + (doc_id * 13) % 48"


# -- SQL-side hex encoders (DuckDB) -----------------------------------------

def be32_sql(expr: str) -> str:
    """8 lowercase hex chars, big-endian uint32 of an integer SQL expr."""
    return f"lower(lpad(hex({expr}), 8, '0'))"


def le16_sql(expr: str) -> str:
    """4 lowercase hex chars, little-endian uint16."""
    return (
        f"lower(lpad(hex(({expr}) % 256), 2, '0') || "
        f"lpad(hex(({expr}) // 256), 2, '0'))"
    )


def le32_sql(expr: str) -> str:
    """8 lowercase hex chars, little-endian uint32."""
    return (
        f"({le16_sql(f'({expr}) % 65536')} || "
        f"{le16_sql(f'({expr}) // 65536')})"
    )


# -- Spark-side hex encoders (codegen Columns) -------------------------------

def be32_col(col):
    """8 lowercase hex chars, big-endian uint32 of an int Column."""
    import pyspark.sql.functions as F

    return F.lower(F.lpad(F.hex(col.cast("bigint")), 8, "0"))


def le16_col(col):
    """4 lowercase hex chars, little-endian uint16 of an int Column."""
    import pyspark.sql.functions as F

    c = col.cast("bigint")
    return F.lower(
        F.concat(
            F.lpad(F.hex(c % 256), 2, "0"),
            F.lpad(F.hex((c / 256).cast("bigint")), 2, "0"),
        )
    )


def le32_col(col):
    """8 lowercase hex chars, little-endian uint32 of an int Column."""
    import pyspark.sql.functions as F

    c = col.cast("bigint")
    return F.concat(le16_col(c % 65536), le16_col((c / 65536).cast("bigint")))


# -- BMP (round 6: the REAL codec-free pixel decode) -------------------------
#
# 24-bit uncompressed BI_RGB needs no codec at all: the pixel array is
# raw BGR byte triples, rows padded to 4 bytes — so a full DECODE
# (header parse -> stride arithmetic -> per-channel pixel walk) is pure
# fixed-point arithmetic both engines can run.  Layout (1-based
# offsets): "BM" @1 | file_size le32 @3 | reserved 4B | pixel-array
# offset le32 @11 (=54) | DIB size le32 @15 (=40) | width le32 @19 |
# height le32 @23 | planes le16 @27 (=1) | bpp le16 @29 (=24) |
# compression le32 @31 (=0) | image size le32 @35 | ppm x/y le32 |
# colors used/important le32 | pixel rows (bottom-up, stride-padded).
BMP_SIG_HEX = "424d"  # b"BM"

# doc_id-derived image parameters: tiny dims so the per-image pixel
# walk is a bounded codegen fold (<= 16 px), every (w, h) combination
# exercised within 16 consecutive ids.
BMP_W = "1 + doc_id % 4"
BMP_H = "1 + (doc_id * 3) % 4"
# data byte q (0-based offset within the pixel array; padding bytes 0)
BMP_PX = "(doc_id * 7 + q * 13) % 256"


def bmp_stride_sql(w: str) -> str:
    """Row stride in bytes: 3·w rounded up to a multiple of 4 (SQL)."""
    return f"((3 * ({w}) + 3) // 4) * 4"


# -- WAV 16-bit PCM (round 7: the codec-free AUDIO decode, twin of BMP) ------
#
# 16-bit PCM in a canonical 44-byte-header RIFF/WAVE needs no codec
# either: the data chunk is raw little-endian SIGNED 16-bit samples,
# frames interleaved channel-major — so a full audio DECODE (header
# parse -> frame walk -> per-channel sum / sum-of-squares / peak fold)
# is pure fixed-point arithmetic both engines can run.  Sample s of
# frame f, channel c sits at 0-based data offset (f·channels + c)·2;
# signedness: raw u16 v decodes to v − 65536·(v div 32768).
PCM_CH = "1 + doc_id % 2"
PCM_FRAMES = "4 + doc_id % 13"  # 4..16 frames: bounded codegen fold
PCM_BITS = 16
# data byte q (0-based offset within the data chunk)
PCM_SB = "(doc_id * 11 + q * 29) % 256"


# -- MP4 / ISO-BMFF canonical header (round 8) -------------------------------
#
# The general ISO-BMFF box walk has VARIABLE offsets (boxes in any
# order, any size) and stays in the bounded-Arrow path
# (sources/multimodal.py mp4_box_meta).  But the engine writes its own
# fixtures, so the fixture uses a FIXED canonical layout — ftyp
# (20 bytes: size | 'ftyp' | major brand | minor version | exactly one
# compatible brand) immediately followed by moov (8-byte box header)
# whose first child is a version-0 mvhd (108 bytes) — making the header
# parse pure fixed-offset nibble arithmetic both engines can run in
# codegen (the q_media_header_roundtrip discipline; round-7 verdict
# task 4).  Fixed 1-based byte offsets: ftyp size @1 (=20), 'ftyp' @5,
# major brand @9, minor version @13, compatible brand @17, moov size
# @21 (=116), 'moov' @25, mvhd size @29 (=108), 'mvhd' @33,
# version+flags @37 (=0), creation @41, modification @45, timescale
# @49, duration @53 (all be32), rate @57 (1.0 fixed-point), volume @61
# (1.0), 10 reserved bytes @63, unity matrix @73 (36 B), predefined
# @109 (24 B zeros), next_track_id @133.  Total blob: 136 bytes.
FTYP_HEX = "66747970"  # b"ftyp"
MOOV_HEX = "6d6f6f76"  # b"moov"
MVHD_HEX = "6d766864"  # b"mvhd"
MP4_BRANDS = ["isom", "mp42", "avc1", "dash"]  # index doc_id % 4
MP4_BRAND_HEX = [bytes(b, "ascii").hex() for b in MP4_BRANDS]
MP4_TIMESCALES = [600, 1000, 90000, 44100, 48000]  # index doc_id % 5
MP4_MINOR = "(doc_id * 3) % 512"
MP4_CREATED = "3000000000 + (doc_id * 17) % 100000"  # > 2^31: parse as i64
MP4_DURATION = "1 + (doc_id * 131) % 1000000"
MP4_NEXT_TRACK = 2
# rate 1.0 + volume 1.0 + 10 reserved bytes + unity matrix
# {0x10000,0,0, 0,0x10000,0, 0,0,0x40000000} + 24 predefined bytes —
# constant for every canonical file (76 bytes).
MVHD_TAIL_HEX = (
    "00010000"
    + "0100"
    + "00" * 10
    + "00010000"
    + "00000000" * 3
    + "00010000"
    + "00000000" * 3
    + "40000000"
    + "00" * 24
)
assert len(MVHD_TAIL_HEX) == 152


# -- JPEG / JFIF canonical header (round 8) ----------------------------------
#
# The general JPEG parse is a marker SCAN (segments at variable offsets
# — EXIF APP1 first, progressive SOF2, padding) and stays in the
# bounded-Python path (sources/multimodal.py jpeg_sof_dims).  The
# engine-written fixture uses the FIXED canonical JFIF layout every
# baseline writer emits — SOI, then an 18-byte APP0/JFIF segment, then
# SOF0 immediately — so the header parse is fixed-offset nibble
# arithmetic (the MP4 canonical-layout discipline).  1-based byte
# offsets: SOI @1 (ffd8), APP0 marker @3 (ffe0), APP0 len @5 (=16),
# "JFIF\\0" @7, version @12 (1.1), density units @14, Xdensity be16
# @15, Ydensity be16 @17, thumbnail dims @19 (0,0), SOF0 marker @21
# (ffc0), SOF0 len @23 (=17 for 3 components), precision @25 (=8),
# height be16 @26, width be16 @28, n_components @30 (=3), component
# specs @31-39 (Y 2x2 qt0, Cb 1x1 qt1, Cr 1x1 qt1).  Total: 39 bytes
# (header-only fixture — entropy-coded scan data needs a real codec
# and stays stubbed).
JPEG_SOI_APP0_HEX = "ffd8" + "ffe0" + "0010" + "4a46494600" + "0101" + "01"
JPEG_THUMB_HEX = "0000"  # no thumbnail
JPEG_SOF0_HEX = "ffc0" + "0011" + "08"  # SOF0, len 17, 8-bit precision
JPEG_COMPONENTS_HEX = "012200" + "021101" + "031101"  # Y 2x2, Cb, Cr
JPEG_W = "16 + (doc_id * 37) % 4080"
JPEG_H = "16 + (doc_id * 61) % 2160"
JPEG_DENSITIES = [72, 96, 150, 300]  # index doc_id % 4; units=1 (dpi)


def be16_sql(expr: str) -> str:
    """4 lowercase hex chars, big-endian uint16 of an integer SQL expr."""
    return f"lower(lpad(hex({expr}), 4, '0'))"


def be16_col(col):
    """4 lowercase hex chars, big-endian uint16 of an int Column."""
    import pyspark.sql.functions as F

    return F.lower(F.lpad(F.hex(col.cast("bigint")), 4, "0"))


# -- PNG with STORED-deflate IDAT (round 11: the codec-free PNG decode) ------
#
# VERDICT r10 task 6: extend the real-decode family (BMP pixels r6,
# WAV PCM r7) with the modality-completing PNG decode that stays pure
# arithmetic.  zlib's STORED (BTYPE=00) block carries the scanline
# stream UNCOMPRESSED — the deflate framing is 5 bytes of plain
# integers (BFINAL/BTYPE byte, LEN le16, NLEN le16 = ones'-complement
# of LEN) — so for a single-final-stored-block PNG the whole IDAT
# "inflate" is a fixed-offset read, row unfiltering (filter type 0) is
# the identity, and channel sums run as codegen over the blob.  The
# zlib ADLER-32 trailer is REAL and verified by the decoder (s1 = 1 +
# Σb mod 65521; s2 = L + Σ(L−q)·b_q mod 65521; adler = s2·2^16 + s1 —
# exact bigint at these sizes); the PNG chunk CRCs are dummy zeros
# like every other fixture in this module (CRC-32's bitwise reflection
# is not worth 32 rounds of codegen; the parsers never check CRC).
# Entropy-coded IDAT (fixed/dynamic Huffman) still needs a real
# inflate and stays honestly stubbed (sources/multimodal.py:66).
#
# Layout (1-based byte offsets), total 68 + L bytes where
# rowbytes = 1 + 3·w (filter byte + RGB triples) and L = h·rowbytes:
#   sig @1 (8 B) | IHDR len be32=13 @9 | "IHDR" @13 | width be32 @17
#   | height be32 @21 | depth 08 @25 | color 02 (truecolor RGB) @26
#   | comp 00 @27 | filter 00 @28 | interlace 00 @29 | CRC 0 @30
#   IDAT len be32 = L+11 @34 | "IDAT" @38 | zlib CMF 78 @42 | FLG 01
#   @43 ((0x78·256+0x01) % 31 = 0) | block 01 @44 (BFINAL=1, BTYPE=00)
#   | LEN le16 @45 | NLEN le16 @47 | raw scanlines @49..48+L
#   | adler be32 @49+L | CRC 0 @53+L
#   IEND len be32=0 @57+L | "IEND" @61+L | CRC 0 @65+L
IDAT_HEX = "49444154"  # b"IDAT"
IEND_HEX = "49454e44"  # b"IEND"
PNG_IHDR_TAIL_RGB_HEX = "0802000000"  # depth 8, color 2 (RGB), 0, 0, 0
ZLIB_STORED_HDR_HEX = "780101"  # CMF 0x78, FLG 0x01, final stored block
PNGS_W = "1 + doc_id % 4"
PNGS_H = "1 + (doc_id * 3) % 4"
# raw scanline byte q (0-based within the stored block; filter-type
# bytes — q % rowbytes = 0 — are 0, everything else this formula)
PNGS_PX = "(doc_id * 5 + q * 17) % 256"


def png_rowbytes_sql(w: str) -> str:
    """Scanline stride: 1 filter byte + 3 channel bytes per pixel."""
    return f"(1 + 3 * ({w}))"
