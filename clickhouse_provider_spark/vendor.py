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

#: Known public bundles that embed a pure-python google.protobuf runtime.
#: Probed in order; each entry is a directory containing ``google/protobuf``.
_BUNDLE_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_SHIM_DIR = os.path.join(
    os.environ.get("SPARK_LOCAL_DIRS", "/tmp"), "spark_graft_pb_shim"
)

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
    the bundle's other top-level modules leak onto sys.path."""
    google_dir = os.path.join(_SHIM_DIR, "google")
    link = os.path.join(google_dir, "protobuf")
    try:
        os.makedirs(google_dir, exist_ok=True)
        if os.path.islink(link) and os.readlink(link) != pb_dir:
            os.remove(link)
        if not os.path.exists(link):
            os.symlink(pb_dir, link)
        return _SHIM_DIR
    except OSError:
        return None


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable (driver AND python workers),
    preferring a real installation; returns whether it is available.

    Worker propagation: PYTHONPATH is set in ``os.environ`` — local-mode
    python workers inherit the driver JVM's environment, which inherits
    this process's environment at JVM launch, so this must run BEFORE the
    SparkSession is created (import-time callers, e.g. the pytest skipif
    at collection, satisfy that naturally). On a real cluster, ship
    protobuf with the usual mechanisms (pip on the image / --py-files).
    """
    try:
        import google.protobuf  # noqa: F401

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
        # major — use its documented escape hatch for this vendored case.
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

            return True
        except ImportError:
            continue
    return False
