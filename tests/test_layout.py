"""Z-order layout: correctness of the interleave and MEASURED file-level
pruning evidence — the claim "a compact z-range bounds every interleaved
dimension" is checked against actual parquet footer min/max stats, not
argued."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.operators.layout import (
    ZORDER_BITS,
    write_zordered,
    zorder_key,
    zorder_key_sql,
)
from tests.conftest import SF_DIR_SMALL


def test_zorder_key_matches_reference_morton(spark):
    """Bit-interleave spot checks against hand-computed Morton codes,
    plus the locality property: adjacent (x, y) cells have z-keys within
    a bounded envelope."""
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (5, 3), (65535, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()
    }

    def morton(x, y):
        z = 0
        for b in range(ZORDER_BITS):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y)
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_zorder_key_negative_inputs_match_duckdb(spark):
    """Negatives take the masked low-16-bit pattern; the same generated
    SQL must yield identical keys in both engines."""
    vals = [(-1, -1), (-5000, 3), (7, -2), (0, -65536)]
    df = spark.createDataFrame(vals, "x long, y long")
    sdf = {(r.x, r.y): r.z for r in df.select(
        "x", "y", zorder_key(["x", "y"]).alias("z")).collect()}
    con = duckdb.connect()
    sql = zorder_key_sql(["x", "y"])
    for x, y in vals:
        (z,) = con.execute(
            f"SELECT {sql} FROM (SELECT CAST({x} AS BIGINT) x, CAST({y} AS BIGINT) y)"
        ).fetchone()
        assert sdf[(x, y)] == z, (x, y)


def _files_matching(con, path_glob, col, lo, hi):
    """Number of parquet files whose [min,max] footer stats for ``col``
    intersect [lo, hi] — exactly the files a stats-pruning scan reads —
    and the total file count."""
    q = f"""
    WITH s AS (
      SELECT file_name,
             MIN(stats_min_value::BIGINT) AS mn,
             MAX(stats_max_value::BIGINT) AS mx
      FROM parquet_metadata('{path_glob}')
      WHERE path_in_schema = '{col}'
      GROUP BY file_name
    )
    SELECT COUNT(*) FILTER (WHERE mx >= {lo} AND mn <= {hi}), COUNT(*) FROM s
    """
    hit, total = con.execute(q).fetchone()
    return hit, total


@pytest.mark.slow
def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The measured claim: against a linear layout sorted on x (perfect
    x-pruning, zero y-pruning), the Z-ordered layout prunes files for
    selective filters on EITHER dimension. Footer min/max stats are read
    back with DuckDB's parquet_metadata — the same stats Spark's scan
    uses for row-group skipping."""
    ev = tables.load(spark, SF_DIR_SMALL, "events").select(
        "event_id",
        (F.col("user_id") % 65536).alias("x"),
        F.pmod(F.round(F.col("value") * 100, 0).cast("long"), F.lit(65536)).alias("y"),
    )
    n_files = 16
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(ev, zpath, ["x", "y"], n_files)
    (
        ev.repartitionByRange(n_files, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    # layout preserves content
    assert (
        spark.read.parquet(zpath).count() == ev.count()
        and spark.read.parquet(lpath).count() == ev.count()
    )
    con = duckdb.connect()
    # ~1/16-wide spans derived from the ACTUAL data range of each dim
    stats = ev.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).first()
    spans = {}
    for dim, lo, hi in (("x", stats[0], stats[1]), ("y", stats[2], stats[3])):
        width = max(1, (hi - lo) // 16)
        start = lo + 4 * width  # an interior slice
        spans[dim] = (start, start + width - 1)
    zx, ztot = _files_matching(con, f"{zpath}/*.parquet", "x", *spans["x"])
    zy, _ = _files_matching(con, f"{zpath}/*.parquet", "y", *spans["y"])
    lx, ltot = _files_matching(con, f"{lpath}/*.parquet", "x", *spans["x"])
    ly, _ = _files_matching(con, f"{lpath}/*.parquet", "y", *spans["y"])
    assert ztot >= n_files // 2 and ltot >= n_files // 2
    # linear: x prunes hard, y reads (nearly) everything — per-file y
    # min/max at small row counts can fall short of the full range
    assert lx <= ltot // 4
    assert ly >= (3 * ltot) // 4
    # z-order: BOTH dimensions prune — each reads at most half the
    # files, and y reads at most half of what the linear layout reads
    assert zx <= ztot // 2, f"x-pruning too weak: {zx}/{ztot}"
    assert zy <= ztot // 2, f"y-pruning too weak: {zy}/{ztot}"
    assert zy * 2 <= ly, f"zorder y-pruning not better than linear: {zy} vs {ly}"


def test_write_zordered_empty_input(spark, tmp_path):
    """A layout rewrite of a partition that compacted to nothing writes
    the empty-but-typed dataset instead of crashing on int(None) bounds."""
    ev = spark.createDataFrame([], "x long, y long, v long")
    out = str(tmp_path / "zempty")
    write_zordered(ev, out, ["x", "y"], 4)
    back = spark.read.parquet(out)
    assert back.count() == 0
    assert set(back.columns) == {"x", "y", "v"}
