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


def test_importance_sample_oracle_saturation_branch():
    """The p >= 1 saturation branch (n_chars >= 2000: always kept) and the
    u64 threshold math, on crafted rows the corpus doesn't cover."""
    import hashlib

    c = duckdb.connect()
    rows = [(0, 10), (1, 1999), (2, 2000), (3, 50_000), (4, 0)]
    values = ", ".join(f"({i}, {n})" for i, n in rows)
    c.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, n_chars)"
    )
    got = set(
        r[0] for r in c.execute(
            f"SELECT doc_id FROM ({ORACLES['importance_sample']})"
        ).fetchall()
    )
    scale, lim = (1 << 64) // 2000, (1 << 64) - 1
    want = set()
    for i, n in rows:
        u = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")
        if u < min(n * scale, lim):
            want.add(i)
    assert got == want
    assert {2, 3} <= got  # saturated docs always kept
    assert 4 not in got  # zero-weight doc never kept


def test_normalize_text_oracle_whitespace_classes():
    """Arrow utf8_trim_whitespace and DuckDB trim() must agree on the
    whitespace classes: ASCII tab/newline (collapsed by \\s+) and U+00A0,
    which RE2 \\s does NOT match but BOTH engines' trim strips at the
    edges (verified empirically)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    texts = [
        "  Hello\tWorld \n",
        "a\u00a0b",            # nbsp inside: survives collapse AND trim
        "\u00a0c d\u00a0",    # nbsp at the edges: trimmed by both
        "",
        "   ",
        "MiXeD   CASE\t\ttabs",
    ]
    c = duckdb.connect()
    c.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        c.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    got = dict(
        c.execute(
            f"SELECT doc_id, norm_text FROM ({ORACLES['normalize_text']})"
        ).fetchall()
    )
    want = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(pa.array(texts)), r"\s+", " ")
    ).to_pylist()
    assert got == {i: w for i, w in enumerate(want)}
    assert got[1] == "a\u00a0b"       # inner nbsp preserved by both
    assert got[2] == "c d"            # edge nbsp stripped by both
    assert got[5] == "mixed case tabs"


def test_lang_length_quantiles_selection_rule_edges():
    """The integer selection rule (index = ceil(q*n)-1 on the ascending
    sort) must match DuckDB quantile_disc on tiny strata — group sizes
    1..6, where off-by-one indexing shows immediately."""
    c = duckdb.connect()
    c.execute("CREATE TABLE documents (doc_id BIGINT, lang VARCHAR, n_chars BIGINT)")
    rows = []
    i = 0
    for gi, size in enumerate([1, 2, 3, 4, 5, 6]):
        for v in range(size):
            rows.append((i, f"g{gi}", (v + 1) * 10 + gi))
            i += 1
    for r in rows:
        c.execute("INSERT INTO documents VALUES (?, ?, ?)", list(r))
    # raw fetchall returns DuckDB DECIMALs for the unnested q list;
    # float() them (Decimal('0.9') != 0.9)
    got = {
        (lang, float(q)): v
        for lang, q, v in c.execute(
            f"SELECT lang, q, value FROM ({ORACLES['lang_length_quantiles']})"
        ).fetchall()
    }
    qs = [(1, 4, 0.25), (1, 2, 0.5), (3, 4, 0.75), (9, 10, 0.9)]
    by_lang: dict[str, list[int]] = {}
    for _, lang, n in rows:
        by_lang.setdefault(lang, []).append(n)
    for lang, vals in by_lang.items():
        vals = sorted(vals)
        n = len(vals)
        for num, den, q in qs:
            assert got[(lang, q)] == vals[(num * n + den - 1) // den - 1], (
                lang, q, n
            )


def test_pii_scrub_oracle_matches_arrow_kernels_on_edges():
    """The corpus props only exercise digit runs; guard the email branch
    and the email/digit interaction (emails containing digits must be
    redacted as ONE <EMAIL>, not leave <NUM> fragments; text around
    redactions must survive) by running the oracle SQL over a crafted
    events view against the same Arrow kernels the query uses."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from owlcrawler_ray.pipelines.queries import _PII_EMAIL, _PII_NUM

    rows = [
        (0, '{"k": 69}'),
        (1, "contact bob42@example.com or 555 0199"),
        (2, "a1b2c3 x@y.io 7"),
        (3, ""),
        (4, "no pii here"),
        (5, "double..dots@weird-host.org.uk trailing 000"),
        (6, "@notanemail 123@456"),  # local/domain shapes that must NOT match
    ]
    con = duckdb.connect()
    values = ", ".join(
        "({}, '{}')".format(i, p.replace("'", "''")) for i, p in rows
    )
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM (VALUES {values}) AS t(event_id, props)"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(ORACLES["pii_scrub"]).fetchall()
    }
    p = pa.array([x for _, x in rows], pa.string())
    n_mail = pc.count_substring_regex(p, _PII_EMAIL)
    p1 = pc.replace_substring_regex(p, _PII_EMAIL, "<EMAIL>")
    n_num = pc.count_substring_regex(p1, _PII_NUM)
    p2 = pc.replace_substring_regex(p1, _PII_NUM, "<NUM>").to_pylist()
    n = pc.add(n_mail, n_num).to_pylist()
    got = {i: (p2[j], n[j]) for j, (i, _) in enumerate(rows)}
    assert got == want
    # the branches fire: at least one email redacted, digits inside an
    # email must NOT surface as <NUM>
    assert "<EMAIL>" in got[1][0] and "42" not in got[1][0]
    assert got[1][0].count("<NUM>") == 2
