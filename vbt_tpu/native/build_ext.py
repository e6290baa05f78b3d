"""In-place build of the _hostops C extension (no pybind11 needed)."""

import os
import shutil
import sys
import sysconfig
import tempfile

import numpy as np


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "csrc", "hostops.cpp")
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(here, f"_hostops{ext_suffix}")

    cxx = os.environ.get("CXX", "g++")
    python_include = sysconfig.get_paths()["include"]
    numpy_include = np.get_include()

    with tempfile.TemporaryDirectory() as tmp:
        obj = os.path.join(tmp, "hostops.o")
        compile_cmd = (
            f"{cxx} -O3 -fPIC -std=c++17 -I{python_include} -I{numpy_include} "
            f"-c {src} -o {obj}"
        )
        link_cmd = f"{cxx} -shared {obj} -o {out}.tmp"
        for cmd in (compile_cmd, link_cmd):
            if os.system(cmd) != 0:
                return 1
        shutil.move(f"{out}.tmp", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
