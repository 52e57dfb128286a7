"""Test-only protobuf shim for Spark's Python worker processes (E8).

Spark 4's ``transformWithStateInPandas`` speaks protobuf between each
Python worker and the JVM state server.  This container installs no
``protobuf`` wheel, but the Google Cloud SDK (baked in) bundles a complete
pure-Python protobuf runtime.  Two gaps remain:

1. Spark's generated ``StateMessage_pb2`` requires gencode 6.33.0 while the
   bundled runtime is 6.32.0-dev; the validator rejects runtime-older-than-
   gencode even within the same major.  Plain proto3 messages are wire-
   compatible across a single minor, so we relax EXACTLY that case (cross-
   major mismatches still raise).
2. The worker processes never run ``tests/conftest.py`` — they are forked
   by the executor with the driver's environment — so the shim must load at
   interpreter startup.  Python's ``site`` module imports ``sitecustomize``
   from ``sys.path``; conftest puts this directory on ``PYTHONPATH`` (there
   is no competing sitecustomize in the container), which covers both the
   TWS driver-side runner and the executor workers.
3. Spark places ``spark-core_*.jar`` on the worker's Python path, and that
   jar carries ``google/protobuf/*.proto`` resource entries — so in workers
   ``import google.protobuf`` "succeeds" as an EMPTY namespace package
   (``__file__ is None``) that both shadows the bundle and defeats a naive
   import probe.  A namespace-only ``google.protobuf`` is treated as
   absent: stale ``google*`` modules are purged so the re-import finds the
   bundle's regular package (a regular package beats namespace portions in
   the same parent path scan).

This file is deliberately under ``tests/`` — it is a test-environment
shim, not part of the engine.  Production clusters install the real
``protobuf`` wheel and none of this runs (the first branch returns).
"""

import os
import sys

_BUNDLE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _install() -> None:
    try:
        import google.protobuf

        if getattr(google.protobuf, "__file__", None):
            return  # a real protobuf is installed; nothing to shim
        # namespace-only (spark-core jar resource dirs): treat as absent
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_BUNDLE, "google", "protobuf")):
        return
    for name in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[name]
    sys.path.append(_BUNDLE)  # append, never prepend: shadow nothing
    try:
        from google.protobuf import runtime_version as rv

        if not getattr(sys.modules["google.protobuf"], "__file__", None):
            raise ImportError("still namespace-only")
    except ImportError:
        sys.path.remove(_BUNDLE)
        return

    _orig = rv.ValidateProtobufRuntimeVersion

    def _relaxed(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):
        try:
            _orig(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location)
        except rv.VersionError:
            if gen_major != rv.MAJOR:
                raise  # cross-major is a real wire-compat risk: keep fatal

    rv.ValidateProtobufRuntimeVersion = _relaxed


_install()
