"""On-demand native build (rtfs_net_tpu/_native.py).

The driver's fresh-checkout dryrun imports the package with no prebuilt
extension; round 3's dryrun failed because PESQ silently degraded to NaN.
These tests pin the auto-build path: compiling from a pristine source copy
works, and concurrent callers (the eval engine scores from a thread pool)
all converge on one module instead of memoizing a mid-build failure.
"""
import concurrent.futures
import os
import shutil

import pytest

from rtfs_net_tpu import _native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_from_clean_source_copy(tmp_path):
    src = os.path.join(REPO, "native")
    if not os.path.isdir(src):
        pytest.skip("native/ sources not present")
    work = tmp_path / "native"
    shutil.copytree(src, work, ignore=shutil.ignore_patterns("build", "*.so"))
    libdir = _native._build(str(work))
    assert libdir is not None
    built = [f for f in os.listdir(libdir)
             if f.startswith("rtfs_net_tpu_native") and f.endswith(".so")]
    assert built, os.listdir(libdir)


def test_load_native_thread_safe():
    """16 threads racing load_native must all get the SAME module object —
    none may observe a spurious None while another thread builds."""
    with concurrent.futures.ThreadPoolExecutor(16) as ex:
        mods = list(ex.map(lambda _: _native.load_native(), range(16)))
    assert len({id(m) for m in mods}) == 1
    if mods[0] is not None:  # toolchain-less hosts legitimately get None
        assert mods[0].pesq is not None


def test_pesq_dispatcher_uses_native_when_buildable():
    if _native.load_native() is None:
        pytest.skip("no toolchain")
    from rtfs_net_tpu.metrics.pesq import _resolve

    kind, fn = _resolve()
    assert kind == "native" and fn is not None
