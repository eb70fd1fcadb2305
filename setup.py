"""Build hooks: compile the native WAV codec (csrc/wavio.cpp) into the
package as a ctypes shared library.

The library is optional — audiodec_tpu.data.wav falls back to a pure-NumPy
RIFF codec when the .so is absent or the host has no C++ toolchain — so the
build step degrades to a warning instead of failing the install.  Metadata
lives in pyproject.toml.
"""

import os
import shutil
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


def _compile_wavio(out_dir: str) -> bool:
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "csrc", "wavio.cpp")
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which("c++")
    if not (cxx and os.path.exists(src)):
        return False
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "libwavio.so")
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-o", out, src]
    try:
        subprocess.check_call(cmd)
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"warning: native wavio build failed ({e}); "
              "using the NumPy WAV fallback", file=sys.stderr)
        return False


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        # source tree (editable installs read from here)
        _compile_wavio(os.path.join("audiodec_tpu", "data", "_native"))
        # build tree (wheel installs ship this copy)
        if self.build_lib:
            _compile_wavio(os.path.join(self.build_lib, "audiodec_tpu",
                                        "data", "_native"))


setup(cmdclass={"build_py": BuildPyWithNative})
