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
