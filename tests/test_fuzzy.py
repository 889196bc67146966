"""Blocked fuzzy linkage: planted-typo recall, frequency pruning, and
the distance threshold."""

from pyspark.sql import functions as F

import __spark_entry__ as em
from lightcurvesclassifier_spark.operators import fuzzy
from tests.conftest import SF_ORACLE


def test_planted_typos_all_recovered(spark):
    out = em.queries()["fuzzy_match"](spark, SF_ORACLE).toPandas()
    # every typo'd catalog row (key%3 != 2) pairs with its own source
    # at distance exactly 1, despite the shared-prefix block being
    # occupancy-pruned
    self_pairs = out[out.id_a == out.id_b]
    n_typo = len([k for k in range(1, 1501) if k % 3 != 2])
    assert len(self_pairs) == n_typo
    assert (self_pairs.dist == 1).all()


def test_hot_block_pruned_but_pair_survives_via_other_block(spark):
    # 100 names share the prefix block 'AAAA'; the pair differing only
    # in the head is lost to the prune, but a pair differing in the
    # MIDDLE keeps its intact suffix block and survives
    a_rows = [(i, f"AAAA-common-{i:04d}") for i in range(100)]
    b_rows = [(0, "AAAX-common-0000"),  # head edit: suffix block intact
              (1, "AAAA-comXon-0001")]  # middle edit: both blocks intact
    a = spark.createDataFrame(a_rows, "star_id long, name string")
    b = spark.createDataFrame(b_rows, "star_id long, name string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy.fuzzy_name_pairs(
            a, b, max_dist=2, max_block_occupancy=10
        ).collect()
    }
    assert got[(0, 0)] == 1  # found via the last-4 block
    assert got[(1, 1)] == 1
    # no all-pairs explosion through the pruned 'AAAA' block: only the
    # genuine near matches appear
    assert all(ia == ib for (ia, ib) in got)


def test_distance_threshold_excludes_far_names(spark):
    a = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "zzzzzzzz")], "star_id long, name string"
    )
    b = spark.createDataFrame(
        [(3, "abcdeXgh"), (4, "abXXXXgh")], "star_id long, name string"
    )
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy.fuzzy_name_pairs(a, b, max_dist=2).collect()
    }
    assert got.get((1, 3)) == 1
    assert (1, 4) not in got  # distance 4 > threshold
    assert not any(ia == 2 for ia, _ in got)
