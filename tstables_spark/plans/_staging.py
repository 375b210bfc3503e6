"""Per-application scratch space for staged fixtures and sinks.

Every staged layout the plans create (bucketed as-of tables, stream
source dirs, streaming checkpoints, sink outputs) lives under ONE
per-application temp root that is removed at interpreter exit, and
staged catalog tables register a best-effort DROP — so repeated
3-scale sweeps inside one session overwrite or reuse instead of
accumulating orphan mkdtemp dirs and catalog entries.

Kept in a private helper (not a plans module) so importing it never
registers queries.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_APP_ROOTS: dict[str, str] = {}


def scratch_dir(spark, prefix: str) -> str:
    """``mkdtemp`` under the session's auto-cleaned staging root.

    The root is created once per Spark application and ``rmtree``'d at
    interpreter exit, bounding on-disk accumulation to one live app's
    working set regardless of how many sf sweeps run."""
    app = spark.sparkContext.applicationId
    root = _APP_ROOTS.get(app)
    if root is None:
        root = tempfile.mkdtemp(prefix="tstables_stage_")
        _APP_ROOTS[app] = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=root)


def register_staged_table(spark, table: str) -> None:
    """Best-effort DROP of a staged catalog table at interpreter exit.

    The data files live under ``scratch_dir`` (external tables), so the
    bytes are reclaimed by the root's ``rmtree`` either way; this keeps
    the metastore from accumulating dangling entries when the warehouse
    outlives the app (e.g. a derby metastore in the repo dir)."""

    def _drop() -> None:
        try:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        except Exception:
            pass  # JVM gateway may already be down at exit

    atexit.register(_drop)
