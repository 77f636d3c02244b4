"""S5 multi-record parser: STOCKHOLM-shaped tagged-record files."""

from __future__ import annotations

from hsearch_spark.sources.records import parse_tagged_records, read_tagged_records

SAMPLE = """\
# comment line
#=GF ID fam_alpha
#=GF DE some description
seq1/1-10 ABCDEFGH
seq2/5-20 IJKLMNOP
//
#=GF ID fam_beta
seq3 QRSTUV
//
"""


def test_parse_tagged_records(spark):
    files = spark.createDataFrame(
        [("f1.sto", SAMPLE)], "path string, content string"
    )
    rows = parse_tagged_records(files).collect()
    got = {(r["rec_idx"], r["rec_id"], r["member"], r["payload"]) for r in rows}
    assert got == {
        (0, "fam_alpha", "seq1/1-10", "ABCDEFGH"),
        (0, "fam_alpha", "seq2/5-20", "IJKLMNOP"),
        (1, "fam_beta", "seq3", "QRSTUV"),
    }


def test_read_tagged_records_multi_file(spark, tmp_path):
    (tmp_path / "a.sto").write_text(SAMPLE)
    (tmp_path / "b.sto").write_text("#=GF ID solo\nm1 X\n//\n")
    rows = read_tagged_records(spark, str(tmp_path)).collect()
    by_rec = {}
    for r in rows:
        by_rec.setdefault(r["rec_id"], 0)
        by_rec[r["rec_id"]] += 1
    assert by_rec == {"fam_alpha": 2, "fam_beta": 1, "solo": 1}
    # record indices are per-file (boundaries never span files)
    solo = [r for r in rows if r["rec_id"] == "solo"][0]
    assert solo["rec_idx"] == 0 and solo["file"].endswith("b.sto")
