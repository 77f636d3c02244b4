"""Alignment scoring: vectorized Levenshtein kernel + pair operator."""

from __future__ import annotations

import numpy as np
import pytest

from hsearch_spark.operators.align import _levenshtein, edit_similarity_pairs


def _ref_lev(a: str, b: str) -> int:
    """Textbook O(nm) reference implementation."""
    n, m = len(a), len(b)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(
                prev[j - 1] + (a[i - 1] != b[j - 1]),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return prev[m]


CASES = [
    ("", ""), ("a", ""), ("", "abc"), ("abc", "abc"),
    ("kitten", "sitting"), ("flaw", "lawn"), ("abcdef", "azced"),
    ("the quick brown fox", "the quick brown cat"),
    ("aaaa", "bbbb"), ("ab", "ba"),
]


@pytest.mark.parametrize("x,y", CASES)
def test_kernel_matches_reference(x, y):
    assert _levenshtein(x.encode(), y.encode(), None) == _ref_lev(x, y)


def test_kernel_random_fuzz():
    rng = np.random.default_rng(7)
    for _ in range(50):
        x = bytes(rng.integers(97, 101, rng.integers(0, 30)).astype(np.uint8))
        y = bytes(rng.integers(97, 101, rng.integers(0, 30)).astype(np.uint8))
        assert _levenshtein(x, y, None) == _ref_lev(
            x.decode(), y.decode()
        )


def test_banded_exact_within_band():
    x, y = b"abcdefghij", b"abcdefghiX"
    assert _levenshtein(x, y, band=3) == 1
    # outside the band: result only guarantees "> band"
    far = _levenshtein(b"aaaaaaaaaa", b"bbbbbbbbbb", band=2)
    assert far > 2


def test_edit_similarity_pairs_operator(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown cat"),
         (3, "totally different words")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    got = {
        (r["a"], r["b"]): (r["edit_distance"], r["edit_sim"])
        for r in edit_similarity_pairs(pairs, docs).collect()
    }
    assert got[(1, 2)][0] == 3
    assert got[(1, 2)][1] == pytest.approx(1 - 3 / 19)
    assert got[(1, 3)][0] == _ref_lev(
        "the quick brown fox", "totally different words"
    )


def test_kernel_char_level_unicode():
    import numpy as np

    def cp(s):
        return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)

    # 3-byte CJK chars: byte-level DP would report 3 per substitution
    assert _levenshtein(cp("日本語"), cp("日本誤"), None) == 1
    assert _levenshtein(cp("héllo"), cp("hello"), None) == 1


def test_banded_early_exit_clamped_to_band_plus_one():
    # far-apart strings: result must be exactly band+1, never a BIG bound
    assert _levenshtein(b"aaaaaaaaaa", b"bbbbbbbbbb", band=2) == 3
    # length-gap short-circuit too
    assert _levenshtein(b"aaaaaaaaaaaaaaaaaaaa", b"a", band=4) == 5


def test_edit_similarity_pairs_unicode(spark):
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, "日本語のテキスト"), (2, "日本語のテキスス")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    row = edit_similarity_pairs(pairs, docs).collect()[0]
    assert row["edit_distance"] == 1  # char-level, not byte-level (3)
    assert row["edit_sim"] == _pytest.approx(1 - 1 / 8)
