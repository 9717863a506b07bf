"""Edge-case guards for the round-3 'exact replica' SQL oracles: the
corpus never exercises CJK text, non-English stopwords or empty documents,
so these run the SAME oracle SQL over a crafted in-memory `documents`
view and compare against the Python functions directly (no Ray needed)."""

import duckdb
import numpy as np
import pytest

from owlcrawler_ray.functions.textops import (
    min_fingerprint,
    predict_lang,
    simhash64,
)
from owlcrawler_ray.pipelines.queries import ORACLES

ROWS = [
    (0, "en", "the cat and the hat went to the market for it is that"),
    (1, "es", "el perro y la casa de que un gato en por con los"),
    (2, "zh", "一二三四五六七八九十" * 5),
    (3, "xx", ""),
    (4, "xx", "   "),
    (5, "xx", "zz qq ww"),  # no markers anywhere -> unknown
    (6, "fr", "le chat et la maison de les une est que pour"),
    (7, "mx", "the el der le " * 30),  # multi-language tie soup
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    values = ", ".join(
        f"({i}, '{lang}', '{text}')" for i, lang, text in ROWS
    )
    c.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, lang, text)"
    )
    return c


def test_lang_id_oracle_covers_cjk_and_marker_branches(con):
    got = dict(
        con.execute(
            f"SELECT doc_id, pred_lang FROM ({ORACLES['lang_id']})"
        ).fetchall()
    )
    want = {i: predict_lang(text) for i, _, text in ROWS}
    assert got == want
    # the branches actually fire on this fixture: zh via the CJK ratio
    # (the r3 review found the '\\uXXXX' escape form left this branch
    # dead), plus en/es/fr and unknown
    assert {"zh", "en", "es", "fr", "unknown"} <= set(got.values())


def test_simhash_oracle_emits_rows_for_wordless_docs(con):
    got = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT doc_id, simhash, band0, band1, band2, band3 "
            f"FROM ({ORACLES['simhash_dedup']})"
        ).fetchall()
    }
    assert set(got) == {i for i, _, _ in ROWS}  # empty docs included
    for i, _, text in ROWS:
        sh = simhash64(text)
        u = np.int64(sh).view(np.uint64)
        bands = tuple(
            int((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)) for b in range(4)
        )
        assert got[i] == (sh, *bands), i


def test_fingerprint_oracle_emits_rows_for_wordless_docs(con):
    got = dict(
        con.execute(
            f"SELECT doc_id, fingerprint FROM ({ORACLES['doc_fingerprints']})"
        ).fetchall()
    )
    assert set(got) == {i for i, _, _ in ROWS}
    for i, _, text in ROWS:
        assert got[i] == min_fingerprint(text), i
