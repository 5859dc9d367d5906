"""table_snapshot cache-key contract (VERDICT r5 #7): process-lifetime
caches of trained state (IVF centroids, PQ codebooks) key on
(path, mtime_ns, size), so rewriting data under the same path invalidates
them — a bare-path key silently serves stale trained state."""

from __future__ import annotations

import os
import time

from py_datalake_move_files_spark.catalog import table_snapshot


def test_snapshot_key_changes_when_file_rewritten(tmp_path):
    p = tmp_path / "embeddings.parquet"
    p.write_bytes(b"v1 bytes")
    k1 = table_snapshot(str(tmp_path), "embeddings")
    # same content, same mtime -> same key (stable across repeated calls)
    assert table_snapshot(str(tmp_path), "embeddings") == k1

    # rewrite with different size -> key changes even if mtime granularity
    # were coarse
    p.write_bytes(b"v2 bytes, longer")
    k2 = table_snapshot(str(tmp_path), "embeddings")
    assert k2 != k1

    # same-size rewrite -> mtime_ns still distinguishes
    time.sleep(0.01)
    p.write_bytes(b"v3 bytes, longer")
    k3 = table_snapshot(str(tmp_path), "embeddings")
    assert k3 != k2


def test_snapshot_key_degrades_to_path_when_missing(tmp_path):
    assert table_snapshot(str(tmp_path), "nope") == (
        os.path.join(str(tmp_path), "nope.parquet"),
    )


def test_trained_state_caches_use_snapshot_keys(tmp_path):
    """The PQ/IVF cache dicts must be keyed by snapshot tuples, and a
    cleared cache retrains on next access — the clear() hook a test or a
    long-lived session uses after an in-session data rewrite."""
    from py_datalake_move_files_spark import queries_ivf, queries_pq

    # the module caches are plain dicts -> .clear() is the supported hook
    for cache in (
        queries_pq._CODEBOOK,
        queries_ivf._CENTROIDS,
        queries_ivf._KM_CENTROIDS,
    ):
        assert isinstance(cache, dict)
        for key in cache:
            # every live key embeds the (path, mtime, size) snapshot tuple
            flat = key if isinstance(key[0], str) else key[0]
            assert isinstance(flat[0], str) and flat[0].endswith(".parquet")
