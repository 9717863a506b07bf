"""Bit-identity + shape gates for functions.vecs.list_to_matrix.

The kernel replaces np.asarray(col.to_pylist(), float64) in every
embedding hot stage; these tests pin that the two paths produce
byte-identical matrices on every input shape the stages see (plain,
chunked, sliced, float64 lists, empty) and that corrupt inputs fail
loudly instead of silently reshaping.
"""

import numpy as np
import pyarrow as pa
import pytest

from owlcrawler_ray.functions.vecs import list_to_matrix


def _ref(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _rand_lists(n, d, seed, pa_type=pa.float32()):
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal((n, d)).astype(
        "float32" if pa_type == pa.float32() else "float64")
    return pa.array(list(vals), pa.list_(pa_type))


def test_bit_identity_plain():
    arr = _rand_lists(257, 64, 1)
    got = list_to_matrix(arr)
    ref = _ref(arr)
    assert got.dtype == np.float64 and got.shape == (257, 64)
    assert np.array_equal(got, ref)  # exact, not allclose


def test_bit_identity_chunked_and_sliced():
    a = _rand_lists(100, 16, 2)
    b = _rand_lists(37, 16, 3)
    ch = pa.chunked_array([a, b])
    assert np.array_equal(list_to_matrix(ch), _ref(ch))
    sl = a.slice(13, 41)  # offsets window starts mid-buffer
    assert np.array_equal(list_to_matrix(sl), _ref(sl))
    # slice of a combined chunked array (what Table.column slicing yields)
    sl2 = ch.combine_chunks().slice(95, 20)
    assert np.array_equal(list_to_matrix(sl2), _ref(sl2))


def test_float64_passthrough_and_empty():
    arr = _rand_lists(10, 8, 4, pa.float64())
    assert np.array_equal(list_to_matrix(arr), _ref(arr))
    empty = pa.array([], pa.list_(pa.float32()))
    assert list_to_matrix(empty).shape == (0, 0)


def test_loud_on_ragged_and_null():
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="ragged"):
        list_to_matrix(ragged)
    nulls = pa.array([[1.0, 2.0], None], pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="null"):
        list_to_matrix(nulls)


def test_faster_than_pylist():
    """Not a benchmark assert on wall time ratios (VM noise) — just a
    sanity floor that the kernel is not slower than the boxing path on
    a realistic batch. Min-of-5 each, generous 1.2x bar."""
    import time

    arr = _rand_lists(2000, 64, 5)

    def best(fn):
        t = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            t.append(time.perf_counter() - t0)
        return min(t)

    new = best(lambda: list_to_matrix(arr))
    old = best(lambda: _ref(arr))
    assert np.array_equal(list_to_matrix(arr), _ref(arr))
    assert new < old * 1.2, (new, old)


# ---------------------------------------------------------------------------
# utf8_quality_counts — flat-byte quality kernel bit-identity
# ---------------------------------------------------------------------------

import re as _re

_NON_ALPHA = _re.compile(r"[^a-zA-Z]")


def _quality_ref(texts):
    tx = (texts.combine_chunks() if isinstance(texts, pa.ChunkedArray)
          else texts).to_pylist()
    return (np.array([len(t) for t in tx], np.float64),
            np.array([len(_NON_ALPHA.sub("", t)) for t in tx], np.float64),
            np.array([len(t.split(" ")) for t in tx], np.float64))


def _assert_counts_equal(arr):
    from owlcrawler_ray.functions.textops import utf8_quality_counts
    got = utf8_quality_counts(arr)
    want = _quality_ref(arr)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_quality_counts_edges():
    _assert_counts_equal(pa.array(
        ["", " ", "a", "héllo wörld", "ab  cd", "ünïcode",
         "日本語 テスト", "x" * 1000, "MiXeD 123 zZ", "\t\n a"]))


def test_quality_counts_chunked_sliced_largestring():
    a = pa.array(["one two", "thréé"], pa.string())
    b = pa.array(["four", ""], pa.string())
    _assert_counts_equal(pa.chunked_array([a, b]))
    big = pa.array([f"doc {i} padding ünït" for i in range(100)])
    _assert_counts_equal(big.slice(17, 41))
    _assert_counts_equal(big.cast(pa.large_string()))
    from owlcrawler_ray.functions.textops import utf8_quality_counts
    for part in utf8_quality_counts(pa.array([], pa.string())):
        assert part.shape == (0,)


def test_quality_counts_null_loud():
    from owlcrawler_ray.functions.textops import utf8_quality_counts
    with pytest.raises(ValueError, match="null"):
        utf8_quality_counts(pa.array(["a", None]))


def test_quality_counts_hypothesis():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, derandomize=True, deadline=None)
    @given(st.lists(st.text(max_size=40), max_size=20))
    def run(texts):
        _assert_counts_equal(pa.array(texts, pa.string()))

    run()


class TestPredictLangBatch:
    """predict_lang_batch must equal the scalar predict_lang per row.
    The batch kernel splits on RE2 [^\\p{L}\\p{N}_]+ — the unicode class
    matching Python re's \\w regime (a bare RE2 \\W is ASCII-only and
    fragments accented words; see test_accented_words_do_not_fragment)."""

    def _both(self, texts):
        import pyarrow as pa
        from owlcrawler_ray.functions.textops import (predict_lang,
                                                      predict_lang_batch)
        arr = texts if isinstance(texts, pa.Array) else pa.array(
            texts, pa.string())
        got = predict_lang_batch(arr).to_pylist()
        want = [predict_lang(x) for x in arr.to_pylist()]
        assert got == want

    def test_testdata_corpora_identical(self):
        import pyarrow.parquet as pq
        for sf in ("0.001", "0.01"):
            t = pq.read_table(
                f"/root/testdata/sf{sf}/documents.parquet", columns=["text"])
            self._both(t.column("text").combine_chunks())

    def test_edge_inventory(self):
        self._both([
            "", " ", "\n\t  ", "...---...", "x" * 3000,
            "the and of to a in is that for it",
            "el la de que y en un",
            "der die und das ist",
            "le la les de et the and of",   # dict-order tie: fr wins
            "the " * 600,                   # >500-word cap
            "一二三四五六七八九十",           # CJK ratio branch
            "一 two three four five six seven eight nine ten eleven",
            "一" * 41 + "a" * 360,           # ratio just over 10% of 400
        ])

    def test_accented_words_do_not_fragment(self):
        """Review finding (r5 cont. 5): a bare RE2 \\W+ split carved
        'leçon' into 'le'+'on' and scored the fragments as French
        stopwords. The unicode-class split must keep accented words
        whole — identical to Python re's \\w regime."""
        self._both([
            "leçon leçon leçon leçon",      # le-fragments would score fr
            "garçon leçon façade reçu",
            "naïve café déjà-vu",
            "Übung macht den Meister und der die das ist von",
            "русский текст тут без маркеров",
            "ça va? le la les de et est que pour",
            "ｆｕｌｌｗｉｄｔｈ ok ①②③ Ⅻ ٱلْعَرَبِيَّة",
        ])

    def test_null_rows_are_defined_unknown(self):
        import pyarrow as pa
        from owlcrawler_ray.functions.textops import predict_lang_batch
        arr = pa.array([None, "the and of to a in", None, ""], pa.string())
        assert predict_lang_batch(arr).to_pylist() == [
            "unknown", "en", "unknown", "unknown"]

    def test_chunked_and_sliced(self):
        import pyarrow as pa
        base = pa.chunked_array([
            pa.array(["the and of to a in", ""], pa.string()),
            pa.array(["el la de que y en un", "plain salad words"],
                     pa.string()),
        ])
        self._both(base)
        flat = base.combine_chunks()
        self._both(flat.slice(1, 2))


class TestClippedShingles:
    """_clipped_shingles is the ONE shingle definition both oracled
    decontamination queries share — pin it to the obvious scalar rule:
    rows with >=3 space-split words emit every consecutive 3-gram, rows
    with fewer emit exactly one clipped shingle (the whole row joined)."""

    @staticmethod
    def _scalar(texts):
        out = []
        for i, t in enumerate(texts):
            ws = (t or "").split(" ")
            if len(ws) >= 3:
                out += [(i, " ".join(ws[j:j + 3]))
                        for j in range(len(ws) - 2)]
            else:
                out.append((i, " ".join(ws[:3])))
        return out

    def _both(self, texts):
        import pyarrow as pa
        from owlcrawler_ray.pipelines.queries import _clipped_shingles
        arr = pa.array(texts, pa.string())
        pos, grams = _clipped_shingles(arr)
        got = list(zip((int(p) for p in pos), grams.to_pylist()))
        # order within a row is document order for the >=3-word rows;
        # clipped rows are appended after — compare as sorted multisets
        assert sorted(got) == sorted(self._scalar(texts))

    def test_mixed_inventory(self):
        self._both([
            "a b c d e", "one two", "solo", "", " ", "  ",
            "w x y z", "a a a a a a", "tab\tstays one\ttoken b c",
        ])

    def test_hypothesis_sweep(self):
        from hypothesis import given, settings, strategies as st
        words = st.text(
            alphabet=st.characters(blacklist_characters=" ",
                                   blacklist_categories=("Cs",)),
            min_size=0, max_size=5)
        texts = st.lists(
            st.lists(words, min_size=0, max_size=8).map(" ".join),
            min_size=1, max_size=12)

        @settings(max_examples=120, deadline=None, derandomize=True)
        @given(texts)
        def run(ts):
            self._both(ts)

        run()
