"""applyInPandasWithState operator: state accumulates across
micro-batches, power-sum stats match a batch recomputation, outliers
detected against the running state."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from lightcurvesclassifier_spark.streaming.stateful import running_curve_stats


@pytest.fixture()
def obs_dir(tmp_path):
    d = tmp_path / "obs_in"
    d.mkdir()
    return d


def _run_stream(spark, obs_dir, ckpt, out_dir):
    stream = (
        spark.readStream.schema("star_id long, t double, mag double")
        .option("maxFilesPerTrigger", 1)
        .csv(str(obs_dir))
    )
    out = running_curve_stats(stream)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out_dir))

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(str(out_dir))


def test_state_accumulates_across_batches(spark, obs_dir, tmp_path):
    rng = np.random.default_rng(7)
    batch1 = rng.normal(10.0, 0.5, 50)
    batch2 = rng.normal(10.0, 0.5, 30)
    # two runs against one checkpoint → deterministic batch order
    (obs_dir / "b1.csv").write_text(
        "\n".join(f"1,{i}.0,{m}" for i, m in enumerate(batch1))
    )
    out_dir = tmp_path / "out1"
    res1 = _run_stream(spark, obs_dir, tmp_path / "ck1", out_dir)
    rows1 = res1.filter(F.col("star_id") == 1).collect()
    assert [r["n_obs"] for r in rows1] == [50]

    (obs_dir / "b2.csv").write_text(
        "\n".join(f"1,{50 + i}.0,{m}" for i, m in enumerate(batch2))
        + "\n1,81.0,25.0"  # gross outlier vs running state
    )
    res2 = _run_stream(spark, obs_dir, tmp_path / "ck1", out_dir)
    rows2 = res2.filter(F.col("star_id") == 1).orderBy("n_obs").collect()
    # state survived the restart: second emitted row continues from 50
    assert [r["n_obs"] for r in rows2] == [50, 81]
    final = rows2[-1]
    allm = np.concatenate([batch1, batch2, [25.0]])
    assert final["mean_mag"] == pytest.approx(allm.mean(), rel=1e-9)
    assert final["std_mag"] == pytest.approx(allm.std(), rel=1e-6)
    assert final["t_max"] == 81.0
    assert final["outliers"] >= 1


def test_multiple_stars_sharded_state(spark, obs_dir, tmp_path):
    lines = []
    for sid in range(5):
        for i in range(20):
            lines.append(f"{sid},{i}.0,{10.0 + sid}")
    (obs_dir / "b1.csv").write_text("\n".join(lines))
    res = _run_stream(spark, obs_dir, tmp_path / "ck2", tmp_path / "out2")
    rows = {r["star_id"]: r for r in res.collect()}
    assert set(rows) == set(range(5))
    for sid, r in rows.items():
        assert r["n_obs"] == 20
        assert r["mean_mag"] == pytest.approx(10.0 + sid)
        assert r["std_mag"] == pytest.approx(0.0)


def test_null_mag_rows_do_not_poison_state(spark, obs_dir, tmp_path):
    """A null mag (malformed CSV field) must be skipped like batch
    aggregates skip nulls — s1 += NaN would corrupt the CHECKPOINTED
    state and every later emission for that star."""
    (obs_dir / "b1.csv").write_text(
        "1,0.0,10.0\n1,1.0,\n1,2.0,12.0\n,3.0,9.0"
    )
    got = _run_stream(spark, obs_dir, tmp_path / "ck", tmp_path / "out")
    rows = got.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.star_id == 1 and r.n_obs == 2
    assert r.mean_mag == 11.0
    assert not np.isnan(r.std_mag)
