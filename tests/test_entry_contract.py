"""Driver-contract smoke: entry() and the queries()/oracle_sql() registry
shape, exactly as the driver exercises them."""

import sys

sys.path.insert(0, "/root/repo")


def test_entry_returns_images_dataset(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    n = ds.count()
    assert n > 0
    schema = ds.schema()
    assert schema.names == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    ]


def test_registry_shape(ray_session):
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert len(qs) >= 30
    assert set(osql) <= set(qs)
    assert len(osql) >= 20
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in osql.items():
        assert "SELECT" in sql.upper(), name


def test_cli_job_entry_runs_and_resumes(ray_session, tmp_path):
    """python -m owlcrawler_ray (the ray-job-submit surface): runs inside
    an existing Ray session without re-initing, supports kill+resume."""
    from owlcrawler_ray.__main__ import main

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    rc = main(["--out", out, "--ckpt", ck, "--budget", "10",
               "--max-ticks", "12", "--num-hosts", "3", "--base-pages", "6",
               "--seed-hosts", "2"])
    assert rc == 0
    rc = main(["--out", out, "--ckpt", ck, "--budget", "17", "--resume",
               "--num-hosts", "3", "--base-pages", "6", "--seed-hosts", "2"])
    assert rc == 0
    from owlcrawler_ray.sinks import table_store

    pages = table_store.read_all_arrow(out, "pages")
    urls = pages.column("url").to_pylist()
    assert len(urls) == len(set(urls)) > 0


def test_registry_enumerates_oracled_queries_first():
    """The driver scoreboard records a bounded prefix of the registry
    walk (r2 recorded only the first 50 entries), so every SQL-oracled
    query must enumerate before any rows-only one."""
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)
    assert all(n in osql for n in names[: len(osql)])
    assert not any(n in osql for n in names[len(osql):])
