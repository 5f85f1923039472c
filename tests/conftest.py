"""Test harness config.

Forces JAX onto a virtual 8-device CPU platform so sharding logic is testable
without a TPU pod (SURVEY.md §4 test strategy).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The sandbox pre-imports jax via sitecustomize with JAX_PLATFORMS=axon (the
# TPU tunnel), so the env var alone is too late — override the live config
# before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: DISABLED by default — on this runner the
# XLA:CPU AOT cache is unreliable in BOTH directions: loading an entry
# whose recorded machine-feature flags mismatch the host SEGFAULTS
# (compilation_cache.get_executable_and_time), and serializing certain
# fresh executables SIGABRTs (put_executable_and_time), each killing the
# whole suite mid-run. The ~3 min/run it saved is not worth a flaky-fatal
# suite. Opt back in locally with VIDEOLLAMB_JAX_CACHE=1 on a machine
# where the cache is known-good.
if os.environ.get("VIDEOLLAMB_JAX_CACHE") == "1":
    _CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:  # older jax: cache flags unavailable
        pass

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Read-only upstream reference, used purely as a golden oracle in parity
# tests (never imported by the framework itself).
REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def load_reference_package(reldir: str, pkg_name: str):
    """Register a reference directory as an importable package (with relative
    imports working) WITHOUT running any parent __init__.py."""
    import importlib.util
    import types

    path = os.path.join(REFERENCE_ROOT, reldir)
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [path]
        pkg.__package__ = pkg_name
        sys.modules[pkg_name] = pkg
    return sys.modules[pkg_name]


def import_reference_submodule(reldir: str, pkg_name: str, submodule: str):
    import importlib

    load_reference_package(reldir, pkg_name)
    return importlib.import_module(f"{pkg_name}.{submodule}")


def load_reference_module(relpath: str, name: str):
    """Import a single reference source file by path, bypassing the package
    __init__ chain (which pulls in deps like torchvision that aren't needed
    for golden-oracle comparisons)."""
    import importlib.util

    path = os.path.join(REFERENCE_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
