"""Z-order layout (sources/layout.py): the pruning payoff is MEASURED
from parquet footer stats, not asserted from theory — a 2-d box
predicate must overlap far fewer z-ordered files than single-column-
sorted ones, with identical query results. Plus bit-exact DuckDB
parity of the Morton key arithmetic and input validation."""

import duckdb
import pytest

import pyspark.sql.functions as F

from txtlogparser_spark.sources.layout import (
    file_stats,
    files_overlapping_box,
    grid_coord,
    write_zordered,
    zorder_key,
)

BITS, SIDE, N_FILES = 6, 64, 16


@pytest.fixture(scope="module")
def grid_df(spark):
    # uniform 64x64 grid: x = id % 64, y = id DIV 64, payload v
    return spark.range(SIDE * SIDE).selectExpr(
        f"CAST(id % {SIDE} AS BIGINT) AS x",
        f"CAST(id DIV {SIDE} AS BIGINT) AS y",
        "id AS v",
    )


@pytest.fixture(scope="module")
def layouts(spark, grid_df, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    zpath = str(base / "zorder")
    xpath = str(base / "xsorted")
    write_zordered(
        grid_df, zpath,
        [("x", 0, SIDE), ("y", 0, SIDE)], bits=BITS, n_files=N_FILES,
    )
    (
        grid_df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    return zpath, xpath


class TestPruning:
    def test_y_only_box_prunes_zorder_not_xsort(self, layouts):
        """The case single-column sort cannot help: a predicate on the
        OTHER column. Every x-sorted file spans all of y (16/16 files
        overlap); z-ordered files are ~16x16 tiles, so an 8-row y band
        overlaps about one tile-row (~4 of 16; allow slack for
        repartitionByRange's sampled bounds)."""
        zpath, xpath = layouts
        box = {"y": (20, 27)}
        zs = files_overlapping_box(file_stats(zpath, ["x", "y"]), box)
        xs = files_overlapping_box(file_stats(xpath, ["x", "y"]), box)
        assert xs == N_FILES, xs
        assert zs <= N_FILES // 2, zs

    def test_2d_box_prunes_harder(self, layouts):
        zpath, _ = layouts
        box = {"x": (10, 17), "y": (20, 27)}
        zs = files_overlapping_box(file_stats(zpath, ["x", "y"]), box)
        assert zs <= 4, zs

    def test_results_identical_across_layouts(self, spark, layouts):
        zpath, xpath = layouts
        pred = "x BETWEEN 10 AND 17 AND y BETWEEN 20 AND 27"
        za = sorted(
            r["v"] for r in spark.read.parquet(zpath).filter(pred).collect()
        )
        xa = sorted(
            r["v"] for r in spark.read.parquet(xpath).filter(pred).collect()
        )
        assert za == xa
        assert len(za) == 8 * 8


class TestKeyParity:
    def test_duckdb_replays_key(self, spark, grid_df):
        got = sorted(
            (r["v"], r["z"])
            for r in grid_df.withColumn(
                "z",
                zorder_key(
                    [
                        grid_coord("x", 0, SIDE, BITS),
                        grid_coord("y", 0, SIDE, BITS),
                    ],
                    BITS,
                ),
            ).collect()
        )
        # same floor-scale + interleave arithmetic in DuckDB
        def coord(c):
            return (
                f"LEAST(GREATEST(CAST(floor((CAST({c} AS DOUBLE) - 0.0) * "
                f"{1 << BITS} / {float(SIDE)}) AS BIGINT), 0), {(1 << BITS) - 1})"
            )

        terms = " + ".join(
            f"(((({coord(c)}) >> {i}) & 1) << {2 * i + j})"
            for i in range(BITS)
            for j, c in enumerate(["x", "y"])
        )
        want = sorted(
            (int(v), int(z))
            for v, z in duckdb.connect()
            .execute(
                f"""
                SELECT v, {terms} AS z FROM (
                  SELECT r % {SIDE} AS x, r // {SIDE} AS y, r AS v
                  FROM range({SIDE * SIDE}) t(r))
                """
            )
            .fetchall()
        )
        assert got == want

    def test_validation(self):
        with pytest.raises(ValueError):
            grid_coord("x", 5, 5, 4)
        with pytest.raises(ValueError):
            zorder_key([], 8)
        with pytest.raises(ValueError):
            zorder_key([F.lit(0), F.lit(0), F.lit(0), F.lit(0)], 16)


class TestMissingStatsColumns:
    def test_missing_stats_on_one_column_still_prunes_on_others(self):
        """Review finding: a column without footer stats broke out of
        the box loop with ok=True, counting files any real reader would
        still prune on the REMAINING columns."""
        stats = [
            # no stats for x, but y = [5, 9] is fully outside the box
            {"file": "a", "min": {"y": 5.0}, "max": {"y": 9.0}},
            # no stats for x, y overlaps: must open
            {"file": "b", "min": {"y": 0.5}, "max": {"y": 2.0}},
        ]
        box = {"x": (0.0, 1.0), "y": (0.0, 1.0)}
        assert files_overlapping_box(stats, box) == 1
