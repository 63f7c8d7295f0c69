"""Lineage-truncating materialization with a reliable-checkpoint option.

Iterative and multi-consumer plans (connected-components label
propagation, Kneser-Ney model statistics, IVF k-means training) must
cut their lineage: without it every iteration/consumer re-executes the
full upstream pipeline, and plans grow without bound.

Two ways to cut lineage, with a real trade-off at cluster scale:

* ``localCheckpoint`` (the default): blocks live on executor local
  storage — no configuration, fast, but the truncated lineage means a
  LOST EXECUTOR during later reads fails the job unrecoverably (the
  blocks cannot be recomputed).  Exactly right on local[N] and for
  short-lived intermediates; risky for long jobs on preemptible fleets.
* ``checkpoint`` to a reliable store (``checkpoint_dir``): blocks are
  written to a fault-tolerant filesystem (HDFS/S3A/...), so executor
  loss only costs a re-read.  The robust form for 1000-executor runs —
  pass a durable path via each operator's ``checkpoint_dir`` argument.

Both forms return a frame with identical rows; a test pins
bit-identity.  ``eager=True`` materializes NOW (one job) so concurrent
downstream consumers never race to fill it lazily — measured faster
than lazy ``.cache()`` under multi-consumer actions (see
kn_bigram_score's note).
"""

from __future__ import annotations

import warnings
from typing import Optional

from pyspark.sql import DataFrame

__all__ = ["materialize"]


def materialize(
    df: DataFrame,
    checkpoint_dir: Optional[str] = None,
    eager: bool = True,
) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    ``checkpoint_dir=None`` → ``localCheckpoint`` (executor-local
    blocks, fast, not fault-tolerant).  A path → reliable
    ``checkpoint()`` under that directory (survives executor loss).
    Spark namespaces each app's checkpoints under a UUID subdirectory
    of the dir, so sharing one durable path across operators and apps
    is safe.

    The checkpoint directory is SESSION-GLOBAL Spark state
    (``setCheckpointDir``), so this sets it only when no directory is
    configured yet; a call whose ``checkpoint_dir`` differs from the
    one already in force warns and leaves the existing one — two
    concurrent operators passing different dirs would otherwise race,
    and the loser's checkpoint files would land under (and be
    retained/cleaned with) the winner's directory.  Use ONE durable
    checkpoint_dir per session; blocks still land under a per-app UUID
    subdirectory, so sharing the dir across apps stays safe.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    # remember the dir WE set: sc.getCheckpointDir() returns the
    # UUID-suffixed resolved form, which never string-equals the
    # user's argument — equality compares NORMALIZED dirs (scheme-
    # aware: 'hdfs://nn/ck', 'file:/tmp/ck', '/tmp/ck/' and 'tmp/ck'
    # all normalize predictably) so a dir set OUTSIDE materialize via
    # plain sc.setCheckpointDir is detected too: a differing dir must
    # never be silently ignored, and an equivalent spelling must not
    # spuriously warn
    ours = getattr(sc, "_aq_checkpoint_dir", None)
    current = sc.getCheckpointDir()
    if current is None:
        sc.setCheckpointDir(checkpoint_dir)
        sc._aq_checkpoint_dir = _norm_dir(checkpoint_dir)
        return df.checkpoint(eager=eager)
    want = _norm_dir(checkpoint_dir)
    if ours is not None:
        same = ours == want
        shown = ours
    else:
        import posixpath

        # the resolved form's UUID leaf is Spark's, not the user's dir
        in_force = _norm_dir(posixpath.dirname(current.rstrip("/")))
        same = in_force == want
        shown = in_force
        if same:
            # adopt the externally-set dir so later checks are exact
            sc._aq_checkpoint_dir = want
    if not same:
        warnings.warn(
            f"materialize: session checkpoint dir is already "
            f"{shown!r}; ignoring checkpoint_dir={checkpoint_dir!r} "
            "(setCheckpointDir is session-global — use one durable "
            "dir per session)",
            stacklevel=2,
        )
    return df.checkpoint(eager=eager)


def _norm_dir(d: str) -> str:
    """Normalized comparison form of a checkpoint dir: scheme-aware
    ((scheme, path) with the local ``file:`` scheme equated to a bare
    path, authority kept — two namenodes' ``/ck`` differ), trailing
    slashes dropped, relative local paths absolutized.  os.path.abspath
    on a URI would prefix the cwd onto ``hdfs://...`` — exactly the
    corruption this helper exists to avoid."""
    import os
    from urllib.parse import urlparse

    p = urlparse(d)
    if p.scheme in ("", "file"):
        path = p.path if p.scheme == "file" else d
        return os.path.abspath(path).rstrip("/") or "/"
    return f"{p.scheme}://{p.netloc}{p.path.rstrip('/') or '/'}"
