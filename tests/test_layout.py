"""Physical layout: bucketed tables join without a shuffle; salted
joins return exactly the plain-join rows."""

import pytest

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.operators.layout import (
    read_table,
    salted_join,
    write_bucketed,
)
from lightcurvesclassifier_spark.sources import testdata
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    obs = testdata.observations(spark, SF_SMOKE)
    stars = testdata.stars(spark, SF_SMOKE).filter(F.col("star_id") < 15)
    write_bucketed(
        obs, "obs_b", buckets=8, sort_cols=["star_id", "t"], path=str(wh / "obs_b")
    )
    write_bucketed(stars, "stars_b", buckets=8, path=str(wh / "stars_b"))
    return "obs_b", "stars_b"


def test_bucketed_join_has_no_exchange(spark, bucketed):
    obs_t, stars_t = bucketed
    joined = read_table(spark, obs_t).join(
        read_table(spark, stars_t).hint("merge"), "star_id"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() > 0


def test_bucketed_aggregate_has_no_exchange(spark, bucketed):
    obs_t, _ = bucketed
    agg = read_table(spark, obs_t).groupBy("star_id").agg(F.avg("mag"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 15


def test_salted_join_matches_plain_join(spark):
    obs = testdata.observations(spark, SF_SMOKE)
    periods = testdata.periods(spark, SF_SMOKE)
    plain = obs.join(periods, "star_id").select("star_id", "t", "mag", "period")
    salted = salted_join(obs, periods, "star_id", n_salts=8).select(
        "star_id", "t", "mag", "period"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_ivf_layout_partition_pruning(spark, tmp_path):
    """IVF-partitioned corpus: a probed top-k reads only the probed
    cells' partitions (PartitionFilters in the scan, fewer files read)
    and returns exactly what the in-memory ivf_topk returns for the
    same centroids and probes."""
    from lightcurvesclassifier_spark.operators.layout import (
        ivf_layout_topk,
        write_ivf_layout,
    )
    from lightcurvesclassifier_spark.operators import similarity
    from tests.conftest import SF_ORACLE

    emb = testdata.load_table(spark, SF_ORACLE, "embeddings")
    path = str(tmp_path / "ivf_corpus")
    centroids = write_ivf_layout(emb, path, n_lists=8)
    import os

    cells = [d for d in os.listdir(path) if d.startswith("_cell=")]
    assert len(cells) == 8  # one directory per cell

    queries = emb.filter(F.col("vec_id") < 3)
    out = ivf_layout_topk(
        spark, path, centroids, queries, k=5, n_probe=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the _cell filter must be a partition filter, not a post-scan one
    assert "_cell" in plan.split("PartitionFilters")[1][:200]
    rows = out.toPandas()
    assert set(rows.groupby("query_id").size()) == {5}
    # parity with the in-memory operator at the same probe settings:
    # both rank by exact cosine within the probed cells
    mem = similarity.ivf_topk(
        emb, queries, k=5, n_lists=8, n_probe=3
    ).toPandas()
    a = rows.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = mem.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_zorder_layout_prunes_partitions_and_clusters_neighbors(
    spark, tmp_path
):
    from lightcurvesclassifier_spark.operators import layout
    from lightcurvesclassifier_spark.sources import testdata
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    st = testdata.stars(spark, SF_SMOKE)
    path = str(tmp_path / "stars_z")
    layout.write_zorder_layout(st, path)
    back = spark.read.parquet(path)
    assert back.count() == st.count()

    # locality: two stars within ~0.1 deg share a zprefix (same coarse
    # Morton cell) far more often than random pairs — check a known
    # neighborhood box query prunes directories
    # a sky-quadrant box: populated even at the sf0.001 star count, yet
    # far from covering every coarse Morton cell
    box = back.filter(
        (F.col("ra_deg") >= 0) & (F.col("ra_deg") < 90)
        & (F.col("dec_deg") >= -90) & (F.col("dec_deg") < 0)
    )
    prefixes = {r.zprefix for r in box.select("zprefix").distinct().collect()}
    n_all = back.select("zprefix").distinct().count()
    assert 0 < len(prefixes) < n_all  # the box does not touch every cell

    # pruning: filtering on zprefix reaches the scan as a partition
    # filter (directory-level pruning, no data read from other cells)
    one = sorted(prefixes)[0]
    plan = (
        back.filter(F.col("zprefix") == one)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "zprefix" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0], plan

    # the key itself is consistent with the oracle rule: recompute and
    # compare for a sample
    recomputed = st.select(
        "star_id",
        layout.sky_zorder_key(F.col("ra_deg"), F.col("dec_deg")).alias("zk"),
    )
    j = back.select("star_id", "zkey").join(recomputed, "star_id")
    assert j.filter(F.col("zkey") != F.col("zk")).count() == 0


def test_zorder_key_clamps_negative_coordinates(spark):
    from lightcurvesclassifier_spark.operators import layout
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, -0.5, -91.0), (2, 0.0, -90.0), (3, 359.99, 90.0)],
        "star_id long, ra_deg double, dec_deg double",
    )
    out = {
        r.star_id: r.zk
        for r in df.select(
            "star_id",
            layout.sky_zorder_key(
                F.col("ra_deg"), F.col("dec_deg")
            ).alias("zk"),
        ).collect()
    }
    max_key = (1 << (2 * layout.ZORDER_BITS)) - 1
    for k in out.values():
        assert 0 <= k <= max_key, out
    # the (-0.5, -91) point clamps to the same cell as (0, -90)
    assert out[1] == out[2]


def test_compact_files_reduces_file_count_preserving_rows(spark, tmp_path):
    from lightcurvesclassifier_spark.operators import layout
    from lightcurvesclassifier_spark.sources import testdata
    from tests.conftest import SF_SMOKE

    obs = testdata.observations(spark, SF_SMOKE)
    frag = str(tmp_path / "fragmented")
    obs.repartition(24).write.parquet(frag)  # 24 tiny files
    n_before = len(layout.list_data_files(spark, frag))
    assert n_before >= 24

    compacted = str(tmp_path / "compacted")
    n_req = layout.compact_files(spark, frag, compacted, target_mb=128)
    n_after = len(layout.list_data_files(spark, compacted))
    assert n_req == 1 and n_after == 1  # tiny table -> one file
    back = spark.read.parquet(compacted)
    assert back.count() == obs.count()
    assert back.exceptAll(obs).count() == 0
