"""CDC replication across schema evolution (VERDICT r10 #4).

``ChangeFeedConsumer._apply_batch`` reads every historical change source
with the source's CURRENT schema — after an add-column evolution, old
change files must null-fill the new column and the mirror must still
converge, whether the mirror drains from scratch AFTER the evolution or
was already mid-feed when the boundary landed.
"""

from __future__ import annotations

from kafka_connect_bigquery_storage_write_spark.sinks import ManifestSinkTable
from kafka_connect_bigquery_storage_write_spark.sinks.cdf_consumer import ChangeFeedConsumer


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _kvx(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, extra long")


def _content(sink, spark):
    return {tuple(r) for r in sink.read(spark).collect()}


def _evolving_source(spark, tmp_path):
    """seed (k,v) -> merge -> ADD COLUMN extra via an insert batch ->
    merge that touches PRE-evolution rows with the new column set."""
    src = ManifestSinkTable(str(tmp_path / "src"), write_mode="committed", schema_evolution="additive")
    src.write_batch(_kv(spark, [(i, "x") for i in range(20)]).coalesce(1), 0)
    upd1 = _kv(spark, [(3, "U3"), (100, "N100")])
    assert src.merge_rows_pruned(spark, upd1, keys=["k"], op_id="b1") is not None
    assert src.log_changes(upd1, 1)
    src.write_batch(_kvx(spark, [(200, "W", 7)]).coalesce(1), 2)  # the evolution boundary
    upd3 = _kvx(spark, [(5, "U5", 55), (100, "N100b", 11)])
    assert src.merge_rows_pruned(spark, upd3, keys=["k"], op_id="b3") is not None
    assert src.log_changes(upd3, 3)
    return src


def test_fresh_mirror_drains_across_evolution(spark, tmp_path):
    src = _evolving_source(spark, tmp_path)
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed", schema_evolution="additive")
    consumer = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    assert consumer.run_available_now(spark) == 4
    assert consumer.poll(spark) == 0
    got = _content(tgt, spark)
    assert got == _content(src, spark)
    # pre-evolution rows read the new column as null; post-evolution
    # values survive the replication
    assert (3, "U3", None) in got and (5, "U5", 55) in got and (200, "W", 7) in got
    assert (100, "N100b", 11) in got


def test_mid_feed_mirror_crosses_the_boundary(spark, tmp_path):
    """The mirror consumes the pre-evolution commits FIRST (its schema
    freezes narrow), then the source evolves — the next drain must grow
    the mirror's schema and converge, not silently drop the new column."""
    src = ManifestSinkTable(str(tmp_path / "src"), write_mode="committed", schema_evolution="additive")
    src.write_batch(_kv(spark, [(i, "x") for i in range(20)]).coalesce(1), 0)
    upd1 = _kv(spark, [(3, "U3")])
    assert src.merge_rows_pruned(spark, upd1, keys=["k"], op_id="b1") is not None
    assert src.log_changes(upd1, 1)
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed", schema_evolution="additive")
    consumer = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    assert consumer.run_available_now(spark) == 2  # narrow-schema state replicated
    # evolution boundary + a post-evolution merge touching old rows
    src.write_batch(_kvx(spark, [(200, "W", 7)]).coalesce(1), 2)
    upd3 = _kvx(spark, [(3, "U3b", 33), (7, "U7", 77)])
    assert src.merge_rows_pruned(spark, upd3, keys=["k"], op_id="b3") is not None
    assert src.log_changes(upd3, 3)
    assert consumer.run_available_now(spark) == 2
    got = _content(tgt, spark)
    assert got == _content(src, spark)
    assert (3, "U3b", 33) in got and (7, "U7", 77) in got and (0, "x", None) in got


def test_mor_upserts_cross_evolution(spark, tmp_path):
    """Same boundary through the merge-on-read path: MOR batches before
    and after an add-column evolution replicate into a converged mirror."""
    src = ManifestSinkTable(str(tmp_path / "src"), write_mode="committed", schema_evolution="additive")
    src.write_batch(_kv(spark, [(i, "x") for i in range(20)]).coalesce(1), 0)
    assert src.upsert_mor(spark, _kv(spark, [(3, "U3"), (100, "N")]), keys=["k"], batch_id=1) is not None
    assert src.upsert_mor(spark, _kvx(spark, [(5, "U5", 55), (3, "U3b", 33)]), keys=["k"], batch_id=2) is not None
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed", schema_evolution="additive")
    consumer = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    assert consumer.run_available_now(spark) == 3
    got = _content(tgt, spark)
    assert got == _content(src, spark)
    assert (3, "U3b", 33) in got and (5, "U5", 55) in got and (100, "N", None) in got
