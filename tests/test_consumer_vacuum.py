"""Consumer-aware vacuum (VERDICT r10 #3).

The CDF retention contract — change sources survive until the slowest
consumer's cursor — becomes PROACTIVE for registered consumers: vacuum
retains unconsumed batch dirs, unapplied delete-vector dirs and the
files a pending DV's change rows reconstruct from. Unregistered
consumers keep the loud-failure behavior.
"""

from __future__ import annotations

import os

import pytest

from kafka_connect_bigquery_storage_write_spark.sinks import ManifestSinkTable
from kafka_connect_bigquery_storage_write_spark.sinks.cdf_consumer import ChangeFeedConsumer


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _sink(spark, path, n_batches=3, rows_per=20):
    sink = ManifestSinkTable(str(path), write_mode="committed")
    for b in range(n_batches):
        sink.write_batch(
            _kv(spark, [(b * rows_per + i, "x") for i in range(rows_per)]).coalesce(1), b
        )
    return sink


def _content(sink, spark):
    return sorted((r["k"], r["v"]) for r in sink.read(spark).collect())


def test_vacuum_retains_unconsumed_batch_dirs(spark, tmp_path):
    """A lagging registered consumer pins absorbed batch dirs; after it
    drains, the same vacuum reclaims them."""
    src = _sink(spark, tmp_path / "src")
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed")
    consumer = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    assert src.compact(spark) is not None  # absorbs all three batch dirs
    removed = src.vacuum(retention_s=0.0)
    assert not any(r.startswith("batch=") for r in removed), (
        "vacuum must retain change sources a registered consumer has not drained"
    )
    # the feed is still fully servable
    assert consumer.run_available_now(spark) == 3
    assert _content(src, spark) == _content(tgt, spark)
    removed = src.vacuum(retention_s=0.0)
    assert {r for r in removed if r.startswith("batch=")} == {"batch=0", "batch=1", "batch=2"}


def test_vacuum_retains_unapplied_dv_and_referenced_files(spark, tmp_path):
    """An unapplied DV delete pins its tombstone dir AND the data dirs its
    change rows are reconstructed from, across a compaction."""
    src = _sink(spark, tmp_path / "src")
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed")
    consumer = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    assert consumer.run_available_now(spark) == 3  # consume the three inserts
    assert src.delete_where_dv(spark, [("k", "<", 10)]) is not None
    assert src.compact(spark) is not None  # absorbs the DV + batch dirs
    src.vacuum(retention_s=0.0)
    # the unapplied delete must still be reconstructable and applicable
    assert consumer.run_available_now(spark) == 1
    assert _content(src, spark) == _content(tgt, spark)
    removed = src.vacuum(retention_s=0.0)
    assert any(r.startswith("batch=") for r in removed)
    assert any(r.startswith("_deletes/") for r in removed)


def test_deregister_releases_the_pin(spark, tmp_path):
    src = _sink(spark, tmp_path / "src")
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed")
    consumer = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    assert src.compact(spark) is not None
    assert not any(r.startswith("batch=") for r in src.vacuum(retention_s=0.0))
    consumer.deregister()
    removed = src.vacuum(retention_s=0.0)
    assert {r for r in removed if r.startswith("batch=")} == {"batch=0", "batch=1", "batch=2"}


def test_slowest_registered_cursor_wins(spark, tmp_path):
    """Two consumers: one drained, one lagging — the lagging one's cursor
    decides retention."""
    src = _sink(spark, tmp_path / "src")
    fast_t = ManifestSinkTable(str(tmp_path / "fast"), write_mode="committed")
    slow_t = ManifestSinkTable(str(tmp_path / "slow"), write_mode="committed")
    fast = ChangeFeedConsumer(src, fast_t, keys=["k"], checkpoint_dir=str(tmp_path / "cf"))
    slow = ChangeFeedConsumer(src, slow_t, keys=["k"], checkpoint_dir=str(tmp_path / "cs"))
    assert fast.run_available_now(spark) == 3
    assert src.compact(spark) is not None
    assert not any(r.startswith("batch=") for r in src.vacuum(retention_s=0.0))
    assert slow.run_available_now(spark) == 3
    removed = src.vacuum(retention_s=0.0)
    assert {r for r in removed if r.startswith("batch=")} == {"batch=0", "batch=1", "batch=2"}


def test_unregistered_consumer_still_fails_loudly(spark, tmp_path):
    """Without a registration the old contract holds: vacuum reclaims, the
    lagging consumer raises on the vanished change source."""
    src = _sink(spark, tmp_path / "src")
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed")
    consumer = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    consumer.deregister()  # simulate a pre-registry consumer
    assert src.compact(spark) is not None
    removed = src.vacuum(retention_s=0.0)
    assert any(r.startswith("batch=") for r in removed)
    with pytest.raises(ValueError, match="vacuumed"):
        consumer.run_available_now(spark)


def test_registry_survives_consumer_restart(spark, tmp_path):
    """A re-created consumer over the same checkpoint reclaims its own
    registration (stable id) instead of leaking a second one."""
    src = _sink(spark, tmp_path / "src")
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed")
    c1 = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    assert c1.run_available_now(spark) == 3
    c2 = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    assert c1.consumer_id == c2.consumer_id
    reg_root = os.path.join(src.root, "_consumers")
    assert len([f for f in os.listdir(reg_root) if f.endswith(".json")]) == 1
    # the restart must NOT regress the registered cursor below the real one
    assert src.compact(spark) is not None
    removed = src.vacuum(retention_s=0.0)
    assert {r for r in removed if r.startswith("batch=")} == {"batch=0", "batch=1", "batch=2"}


def test_vacuum_reclaims_consumed_change_logs(spark, tmp_path):
    """Logged merge change sets (_changes/) have no absorption signal;
    registered cursors are their supersession — consumed sets reclaim,
    unconsumed ones survive, and with no registrations nothing moves."""
    src = _sink(spark, tmp_path / "src", n_batches=1)
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed")
    consumer = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    upd = _kv(spark, [(3, "U")])
    assert src.merge_rows_pruned(spark, upd, keys=["k"], op_id="b1") is not None
    assert src.log_changes(upd, 1)
    # registered but lagging: batch dirs AND the change log are pinned
    removed = src.vacuum(retention_s=0.0)
    assert not any(r.startswith(("_changes/", "batch=")) for r in removed)
    assert consumer.run_available_now(spark) == 2
    removed = src.vacuum(retention_s=0.0)
    assert any(r.startswith("_changes/") for r in removed)
    assert _content(src, spark) == _content(tgt, spark)
    # no registrations: a fresh logged change set is untouchable again
    consumer.deregister()
    upd2 = _kv(spark, [(4, "V")])
    assert src.merge_rows_pruned(spark, upd2, keys=["k"], op_id="b2") is not None
    assert src.log_changes(upd2, 2)
    assert not any(r.startswith("_changes/") for r in src.vacuum(retention_s=0.0))


def test_late_consumer_bootstraps_after_reclaim(spark, tmp_path):
    """The snapshot-then-follow path the change-log reclaim assumes: a
    consumer attaching AFTER vacuum reclaimed the history seeds from the
    table state, then follows only future changes."""
    src = _sink(spark, tmp_path / "src", n_batches=2)
    upd = _kv(spark, [(3, "U")])
    assert src.merge_rows_pruned(spark, upd, keys=["k"], op_id="b2") is not None
    assert src.log_changes(upd, 2)
    t1 = ManifestSinkTable(str(tmp_path / "t1"), write_mode="committed")
    c1 = ChangeFeedConsumer(src, t1, keys=["k"], checkpoint_dir=str(tmp_path / "c1"))
    assert c1.run_available_now(spark) == 3
    src.vacuum(retention_s=0.0)  # history reclaimed past c1's cursor
    # a from-scratch replay is now impossible...
    t_broken = ManifestSinkTable(str(tmp_path / "tb"), write_mode="committed")
    broken = ChangeFeedConsumer(src, t_broken, keys=["k"], checkpoint_dir=str(tmp_path / "cb"))
    with pytest.raises(ValueError, match="vacuumed"):
        broken.run_available_now(spark)
    broken.deregister()
    # ...but bootstrap seeds from table state and follows from there
    t2 = ManifestSinkTable(str(tmp_path / "t2"), write_mode="committed")
    c2 = ChangeFeedConsumer(src, t2, keys=["k"], checkpoint_dir=str(tmp_path / "c2"))
    assert c2.bootstrap(spark) == 40
    assert c2.poll(spark) == 0
    assert _content(src, spark) == _content(t2, spark)
    # future changes flow normally to BOTH mirrors
    upd2 = _kv(spark, [(7, "V"), (100, "N")])
    assert src.merge_rows_pruned(spark, upd2, keys=["k"], op_id="b9") is not None
    assert src.log_changes(upd2, 9)
    assert c2.poll(spark) == 1 and c1.poll(spark) == 1
    assert _content(src, spark) == _content(t2, spark) == _content(t1, spark)
    # a non-empty target refuses (an existing mirror should poll)
    with pytest.raises(ValueError, match="empty target"):
        c1.bootstrap(spark)


def test_vacuum_consumer_ttl_lease(spark, tmp_path):
    """ADVICE r11: a registration is a LEASE. An abandoned consumer's
    stale registration (mtime past consumer_ttl_s) stops pinning change
    sources; a live consumer refreshes its mtime on every poll — even an
    idle or about-to-fail one — so it is never mistaken for abandoned.
    Default (consumer_ttl_s=None) keeps the pin forever."""
    src = _sink(spark, tmp_path / "src")
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed")
    consumer = ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    assert src.compact(spark) is not None
    # lagging + fresh registration: pinned under any TTL
    removed = src.vacuum(retention_s=0.0, consumer_ttl_s=3600.0)
    assert not any(r.startswith("batch=") for r in removed)
    # age the registration past the TTL: the lease expires, pins drop
    reg = consumer._registry_path()
    os.utime(reg, (os.path.getmtime(reg) - 7200, os.path.getmtime(reg) - 7200))
    # default None: still pinned (conservative pre-lease behavior)
    removed = src.vacuum(retention_s=0.0)
    assert not any(r.startswith("batch=") for r in removed)
    # a poll (idle here) heartbeats the lease back to life BEFORE the
    # TTL-bounded vacuum runs — the live consumer keeps its pins ...
    consumer.poll(spark)  # applies everything (also advances the cursor)
    # ... so test expiry with a SECOND lagging state: new batch, aged reg
    src.write_batch(_kv(spark, [(999, "z")]).coalesce(1), 9)
    assert src.compact(spark) is not None
    os.utime(reg, (os.path.getmtime(reg) - 7200, os.path.getmtime(reg) - 7200))
    removed = src.vacuum(retention_s=0.0, consumer_ttl_s=3600.0)
    assert any(r.startswith("batch=") for r in removed), (
        "an expired lease must stop pinning change sources"
    )


def test_registered_consumers_tolerates_vanished_registration(spark, tmp_path, monkeypatch):
    """ADVICE r11 (low): a concurrent deregister() between vacuum's
    listdir and its open must be skipped, not crash the pass."""
    src = _sink(spark, tmp_path / "src")
    tgt = ManifestSinkTable(str(tmp_path / "tgt"), write_mode="committed")
    ChangeFeedConsumer(src, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"))
    real_listdir = os.listdir

    def ghosting(path):
        out = real_listdir(path)
        if str(path).endswith("_consumers"):
            return list(out) + ["ghost-deregistered.json"]
        return out

    monkeypatch.setattr(os, "listdir", ghosting)
    regs = src._registered_consumers()  # must skip the ghost, keep the real one
    assert len(regs) == 1
    src.vacuum(retention_s=0.0)  # and the full pass survives it
