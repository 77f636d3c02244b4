"""Multi-record semi-structured text parsing — the S5 (STOCKHOLM) source.

Reference parity: the Pfam STOCKHOLM parser walks a text file whose
records are terminated by `//` lines, with `#=GF <TAG> <value>` metadata
lines and plain `<name> <payload>` member lines
(IGC/shuffle_data/Pfam/STOCKHOLM.cpp:5-50). That "parse messy
multi-line text into rows" operator class generalizes to WARC segments,
log archives, and any record-per-block format.

Spark-first shape: one input FILE = one parse unit. `spark.read.text`
with wholetext=True gives a DataFrame of (path, content) rows —
parallelism across files, which is how such corpora actually arrive
(thousands of .sto / .warc segments). The parser itself is a
mapInPandas flatMap: each file expands to one row per member line,
carrying its record's metadata. No driver-side reading, no global
line-order dependence (record boundaries never span files).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("rec_idx", T.LongType(), False),
        T.StructField("rec_id", T.StringType(), True),
        T.StructField("member", T.StringType(), False),
        T.StructField("payload", T.StringType(), False),
    ]
)


def parse_tagged_records(
    files: DataFrame, id_tag: str = "ID"
) -> DataFrame:
    """files(path string, content string) -> one row per member line.

    Record grammar (STOCKHOLM-shaped):
      `#=GF <TAG> <value>`  per-record metadata (id_tag names the record)
      `<name> <payload>`    member line
      `//`                  record terminator
      `#` other             comment, skipped
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_f, out_i, out_r, out_m, out_p = [], [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                rec_idx = 0
                rec_id = None
                for line in str(content).splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    if line == "//":
                        rec_idx += 1
                        rec_id = None
                        continue
                    if line.startswith("#=GF"):
                        parts = line.split(None, 2)
                        if len(parts) == 3 and parts[1] == id_tag:
                            rec_id = parts[2]
                        continue
                    if line.startswith("#"):
                        continue
                    name, _, payload = line.partition(" ")
                    out_f.append(path)
                    out_i.append(rec_idx)
                    out_r.append(rec_id)
                    out_m.append(name)
                    out_p.append(payload.strip())
            yield pd.DataFrame(
                {
                    "file": out_f,
                    "rec_idx": pd.array(out_i, dtype="int64"),
                    "rec_id": out_r,
                    "member": out_m,
                    "payload": out_p,
                }
            )

    return files.select("path", "content").mapInPandas(parse, RECORD_SCHEMA)


def read_tagged_records(
    spark: SparkSession, path: str, id_tag: str = "ID"
) -> DataFrame:
    """Directory/glob of record files -> parsed member rows."""
    files = (
        spark.read.text(path, wholetext=True)
        .withColumn("path", F.input_file_name())
        .select("path", F.col("value").alias("content"))
    )
    return parse_tagged_records(files, id_tag=id_tag)
