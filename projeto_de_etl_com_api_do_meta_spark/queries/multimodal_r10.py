"""Round-10 multimodal operator: BMP round-trip.

Adds the row-padding / bottom-up / channel-swap codec quadrant to the real
codec suite (JPEG DCT, PNG DEFLATE, GIF LZW, FLAC prediction+Rice, QOI,
ADPCM, G.711, WAV/PPM/Y4M): BMP is trivially entropy-coded but its byte
layout (BGR order, 4-byte row alignment, bottom-up rows) is exactly the
class of off-by-one surface a binary pipeline gets wrong silently — so the
oracle also recomputes the exact FILE SIZE from the header arithmetic, not
just the pixel sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

_ORACLE_BMP = """
WITH ids AS (
  SELECT doc_id,
         5 + doc_id % 28 AS w,
         4 + doc_id % 11 AS h
  FROM documents WHERE doc_id % 9 = 2
),
m AS (
  SELECT i.doc_id,
         CAST(SUM((7 * r.x + 11 * (c.x // 2) + 29 * ch.x + i.doc_id) % 256)
              AS BIGINT) AS pixel_sum
  FROM ids i, range(0, 14) r(x), range(0, 32) c(x), range(0, 3) ch(x)
  WHERE r.x < i.h AND c.x < i.w
  GROUP BY i.doc_id
)
SELECT i.doc_id,
       CAST(i.w AS INTEGER) AS width,
       CAST(i.h AS INTEGER) AS height,
       CAST((3 * i.w + 3) // 4 * 4 AS BIGINT) AS row_stride,
       CAST(54 + (3 * i.w + 3) // 4 * 4 * i.h AS BIGINT) AS file_size,
       m.pixel_sum,
       TRUE AS ok_format,
       TRUE AS ok_lossless
FROM ids i JOIN m USING (doc_id)
ORDER BY doc_id
"""


@register(
    "multimodal_bmp_roundtrip",
    oracle=_ORACLE_BMP,
    tags=("multimodal",),
    doc=(
        "REAL BMP (24-bit BI_RGB) LOSSLESS round-trip: genuine BM-magic "
        "files — 14+40-byte headers, BOTTOM-UP rows, BGR byte order, "
        "4-byte row padding (widths 5..32 hit every 3w mod 4 residue) — "
        "encoded into the binary column and decoded back inside one "
        "Arrow-batched mapInPandas (multimodal/bmp.py, pure stdlib).  "
        "The DuckDB oracle recomputes the exact decoded pixel sum from "
        "the integer generation rule AND the exact file size from the "
        "stride arithmetic 54 + ceil(3w/4)*4*h, so a single padding "
        "off-by-one anywhere in the writer flunks the differ; "
        "ok_lossless certifies decoded == generated per pixel."
    ),
)
def multimodal_bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..multimodal.binary_ops import attach_bmp_image, bmp_pixels_for_doc
    from ..multimodal.bmp import decode_bmp

    pin_query_session_conf(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 9 == 2)
    )
    imgs = attach_bmp_image(docs)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("row_stride", T.LongType()),
            T.StructField("file_size", T.LongType()),
            T.StructField("pixel_sum", T.LongType()),
            T.StructField("ok_format", T.BooleanType()),
            T.StructField("ok_lossless", T.BooleanType()),
        ]
    )

    def kernel(batches):
        for batch in batches:
            out = []
            for doc_id, payload in zip(batch["doc_id"], batch["image_bytes"]):
                payload = bytes(payload)
                ok_format = payload[:2] == b"BM"
                w, h, rgb = decode_bmp(payload)
                _, _, orig = bmp_pixels_for_doc(doc_id)
                arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
                out.append(
                    (
                        doc_id,
                        w,
                        h,
                        (3 * w + 3) // 4 * 4,
                        len(payload),
                        int(arr.astype(np.int64).sum()),
                        ok_format,
                        bool(np.array_equal(arr, orig)),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return imgs.mapInPandas(kernel, schema=schema).orderBy("doc_id")
