"""Load reference modules as *test oracles only*.

The reference repo at /root/reference is read-only upstream content; we import
its pure-numpy vendored ``transformation.py`` (the classic public-domain
transformations library) purely to generate golden values for parity tests.
No reference code is shipped in kinpoly_tpu.
"""

import importlib.util
import sys
from pathlib import Path

REF = Path("/root/reference")


def load_module(relpath: str, name: str):
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def transformations():
    return load_module("uhc/khrylib/utils/transformation.py", "ref_transformations")
