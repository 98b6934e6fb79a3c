"""Optional vendored-dependency discovery.

``transformWithStateInPandas`` (the SURVEY §2A #22 named primitive —
reference TxCache, transactions.rs:569-575) speaks a protobuf state
protocol between the Python worker and the JVM state server
(``pyspark/sql/streaming/proto/StateMessage_pb2``). The runtime
dependency is ``google.protobuf``, which this container does not ship on
PyPI-reachable networks. Several public SDK bundles carry a pure-python
protobuf runtime, however; :func:`ensure_protobuf` discovers one, exposes
ONLY its ``google/protobuf`` package through a shim directory (never the
bundle's other top-level modules), and wires it into both the driver and
the Python workers.

Production deployments simply ``pip install protobuf``; this module is a
no-op there (a real installation always wins the import).
"""

from __future__ import annotations

import os
import re
import sys
import tempfile

#: Known public bundles that embed a pure-python google.protobuf runtime.
#: Probed in order; each entry is a directory containing ``google/protobuf``.
_BUNDLE_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def _shim_root() -> str:
    """Parent dir for the shim: first entry of SPARK_LOCAL_DIRS (it is a
    comma-separated *list* in Spark) or the platform tmpdir."""
    dirs = os.environ.get("SPARK_LOCAL_DIRS")
    if dirs:
        head = dirs.split(",")[0].strip()
        if head and os.path.isdir(head):
            return head
    return tempfile.gettempdir()


#: mode-0700, unpredictable, owned-by-us shim dir (created lazily, cached
#: for the process). A fixed path under world-writable /tmp would let
#: another local user pre-create google/protobuf and have arbitrary code
#: imported by the driver and every worker via PYTHONPATH.
_shim_dir: str | None = None


def _get_shim_dir() -> str:
    global _shim_dir
    if _shim_dir is None:
        _shim_dir = tempfile.mkdtemp(prefix="spark_graft_pb_shim-", dir=_shim_root())
    return _shim_dir

#: Major version of the protobuf gencode pyspark ships (StateMessage_pb2
#: says "Protobuf Python Version: 6.33.0"). A bundled runtime must match
#: the gencode major; minor may trail (wire format + descriptor handling
#: are stable within a major — the strict minor check is disabled via the
#: runtime's own escape hatch, TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK).
_REQUIRED_MAJOR = 6


def _bundle_version(pb_dir: str) -> tuple[int, ...] | None:
    try:
        with open(os.path.join(pb_dir, "__init__.py")) as fh:
            m = re.search(r"__version__\s*=\s*'([\d.]+)'", fh.read())
        return tuple(int(x) for x in m.group(1).split(".")) if m else None
    except OSError:
        return None


def _build_shim(pb_dir: str) -> str | None:
    """Shim dir exposing only ``google/protobuf`` (symlink), so none of
    the bundle's other top-level modules leak onto sys.path.

    The shim lives in a fresh mkdtemp (0700) dir, so the link path cannot
    pre-exist as attacker-controlled content; still, refuse anything at the
    link path that is not a symlink to exactly ``pb_dir``."""
    shim = _get_shim_dir()
    google_dir = os.path.join(shim, "google")
    link = os.path.join(google_dir, "protobuf")
    try:
        os.makedirs(google_dir, exist_ok=True)
        if os.path.islink(link):
            if os.readlink(link) != pb_dir:
                os.remove(link)
        elif os.path.lexists(link):
            return None  # unexpected non-symlink at the link path: reject
        if not os.path.lexists(link):
            os.symlink(pb_dir, link)
        return shim
    except OSError:
        return None


#: True once a shim was activated while the py4j gateway JVM had NOT yet
#: launched — i.e. the PYTHONPATH change makes it into the JVM's (and thus
#: every python worker's) environment. A shim first activated AFTER the
#: JVM launched is importable on the driver but invisible to workers
#: (their env snapshot predates it — even across session stop/recreate,
#: the gateway JVM and its env persist), so tws would crash with
#: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE instead of falling back.
_shim_reaches_workers: bool | None = None


def _jvm_gateway_launched() -> bool:
    """Whether the py4j gateway JVM has already started. The env snapshot
    workers inherit is taken at GATEWAY launch, not session creation — a
    stopped session leaves the JVM (and its stale env) alive for the next
    session, so probing getActiveSession() would wrongly report a
    post-JVM shim activation as worker-visible."""
    if "pyspark" not in sys.modules:
        return False
    try:
        from pyspark import SparkContext

        return SparkContext._gateway is not None  # noqa: SLF001
    except Exception:  # pragma: no cover - defensive
        return False


def ensure_protobuf(for_workers: bool = False) -> bool:
    """Make ``google.protobuf`` importable, preferring a real installation;
    returns whether it is available.

    ``for_workers=True`` additionally requires that python WORKERS will see
    it too: a real installation always qualifies; a vendored shim only if it
    was activated before any SparkSession existed (PYTHONPATH is inherited
    by workers from the JVM environment, captured at JVM launch). Callers
    deciding whether ``transformWithStateInPandas`` can run must pass True.

    On a real cluster, ship protobuf with the usual mechanisms (pip on the
    image / --py-files); this module is then a no-op.
    """
    global _shim_reaches_workers
    try:
        import google.protobuf  # noqa: F401

        # real install (or previously-activated shim): workers covered iff
        # not a post-session shim activation
        if for_workers and _shim_reaches_workers is False:
            return False
        return True
    except ImportError:
        pass
    for root in _BUNDLE_ROOTS:
        pb_dir = os.path.join(root, "google", "protobuf")
        if not os.path.isdir(pb_dir):
            continue
        ver = _bundle_version(pb_dir)
        if not ver or ver[0] != _REQUIRED_MAJOR:
            continue
        shim = _build_shim(pb_dir)
        if shim is None:
            continue
        # gencode minor (6.33) may lead the bundled runtime minor (6.32):
        # the runtime's ValidateProtobufRuntimeVersion would reject that
        # pairing even though descriptors/wire format are stable within a
        # major — use its documented escape hatch, scoped to this vendored
        # attempt: set only around the confirming import, restored on
        # failure so an unrelated protobuf user never inherits it silently.
        prev_check = os.environ.get("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK")
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        existing = os.environ.get("PYTHONPATH", "")
        if shim not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                shim + (os.pathsep + existing if existing else "")
            )
        if shim not in sys.path:
            sys.path.append(shim)
        try:
            import google.protobuf  # noqa: F401

            if _shim_reaches_workers is None:
                _shim_reaches_workers = not _jvm_gateway_launched()
            if for_workers and not _shim_reaches_workers:
                return False
            return True
        except ImportError:
            if prev_check is None:
                os.environ.pop(
                    "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None
                )
            else:
                os.environ[
                    "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"
                ] = prev_check
            continue
    return False
