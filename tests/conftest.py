"""Test configuration: run everything on a virtual 8-device CPU mesh in
float64 so the 1e-10 effectivity-parity checks are meaningful.

Note: this container's sitecustomize registers the axon TPU plugin and
imports jax at interpreter startup, so env vars alone are too late here —
we must use jax.config.update (backends initialize lazily, so this works as
long as no array has been created yet, which conftest guarantees).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA:CPU compilation cache. The suite is compile-bound on this
# 1-core host (the interpret-mode Pallas hp-loop parity tests spend 70-180 s
# each in the CPU compiler); caching the executables across processes cuts a
# warm full-suite run by an order of magnitude and composes with the
# process-isolated runner (tools/run_tests.py) — every fresh pytest process
# reloads instead of recompiling. Keys hash the optimized HLO + compile
# options, so any code change recompiles. Separate dir from the TPU cache so
# either can be wiped independently. Opt out with JAX_TEST_COMPILATION_CACHE=
# (empty). Note: loading an XLA:CPU AOT result logs a harmless E-line about
# the +prefer-no-scatter/+prefer-no-gather pseudo-features missing from the
# host feature list — XLA tuning hints, not ISA features; pytest captures it.
_cache_dir = os.environ.get(
    "JAX_TEST_COMPILATION_CACHE",
    os.path.expanduser("~/.cache/jax_comp_cache_cpu"),
)
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)


def pytest_collection_modifyitems(session, config, items):
    # The XLA CPU compiler deterministically segfaults compiling large
    # nested-scan / interpret-pallas programs once ~240 executables have
    # accumulated in ONE process (the same tests pass in any partial
    # suite). The documented full-suite entry is ``python
    # tools/run_tests.py``, which batches modules into fresh pytest
    # processes so no process ever gets near the limit. This flag is the
    # safety net for people who run the monolithic ``pytest tests/``
    # anyway: only then does the module-boundary cache clear below engage
    # (partial runs keep full cross-module cache reuse).
    session._xla_cache_guard = len(items) > 200


@pytest.fixture(scope="module", autouse=True)
def _fresh_xla_compiler_state(request):
    if getattr(request.session, "_xla_cache_guard", False):
        jax.clear_caches()
    yield


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}, x64: {jax.config.jax_enable_x64}"
