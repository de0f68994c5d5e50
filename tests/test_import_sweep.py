"""Every package module imports cleanly, and the lazy façade is complete.

Analog of the reference's ``scripts/check_imports.py`` dev gate
(reference: scripts/check_imports.py): a missing transitive import, a
syntax error in a rarely-exercised module, or a stale lazy-façade entry
should fail fast here rather than at a user's first touch. Native-backed
modules must import (they carry exact-parity Python fallbacks) even when
the C++ toolchain is unavailable.
"""

import importlib
import pkgutil

import pytest

import waveformanalysis_tpu as wfa

MODULES = sorted(
    m.name
    for m in pkgutil.walk_packages(wfa.__path__, prefix="waveformanalysis_tpu.")
    # the on-demand-built C++ shared library is ctypes-loaded, not an
    # importable extension module; walk_packages still lists it
    if not m.name.rsplit(".", 1)[-1].startswith("libwfa")
)


def test_sweep_found_the_package():
    assert len(MODULES) > 60, MODULES


@pytest.mark.parametrize("name", MODULES)
def test_module_imports(name):
    importlib.import_module(name)


def test_facade_lazy_attrs_resolve():
    for attr in wfa.__all__:
        assert getattr(wfa, attr) is not None, attr
