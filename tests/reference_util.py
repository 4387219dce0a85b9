"""Helper to import modules from the read-only PyTorch reference mount for
golden-value parity tests.  Tests using it must skip gracefully when the mount
or torch is unavailable."""

import importlib
import importlib.util
import os
import sys

import pytest

REFERENCE_ROOT = "/root/reference"

_cache = {}


def import_reference_module(name: str):
    """Import e.g. ``models.rendering`` from the reference tree, skipping the
    test if the mount or its dependencies are missing.

    Loads the module file directly (bypassing package ``__init__``s, which
    drag in torchvision/kornia/lightning that are not installed here).
    """
    if name in _cache:
        return _cache[name]
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference mount not available")
    pytest.importorskip("torch")
    path = os.path.join(REFERENCE_ROOT, *name.split(".")) + ".py"
    if not os.path.isfile(path):
        pytest.skip(f"reference file {path} missing")
    if REFERENCE_ROOT not in sys.path:
        # APPEND so the reference tree never shadows this repo's top-level
        # modules (train.py/eval.py/opt.py share names with the reference)
        sys.path.append(REFERENCE_ROOT)
    modname = "ref_" + name.replace(".", "_")
    spec = importlib.util.spec_from_file_location(modname, path)
    module = importlib.util.module_from_spec(spec)
    # Intra-reference imports like `from .ray_utils import *` need the parent
    # package; register a lightweight alias so relative imports resolve.
    sys.modules[modname] = module
    try:
        spec.loader.exec_module(module)
    except Exception as exc:  # missing reference deps
        del sys.modules[modname]
        pytest.skip(f"cannot import reference module {name}: {exc}")
    _cache[name] = module
    return module
