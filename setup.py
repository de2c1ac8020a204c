"""Build hook: compile the native host runtime into the package.

Compiles native/rnr_native.cpp (mmap OBJ parser + multithreaded
PNG/JPEG decoder, see rnr_tpu/data/native.py) to
rnr_tpu/librnr_native.so so installed trees carry the library.  The
compile is best-effort: without a C++ toolchain or libpng/libjpeg the
package installs anyway and the pure-NumPy fallbacks take over.
"""

from __future__ import annotations

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "native", "rnr_native.cpp")
OUT = os.path.join(HERE, "rnr_tpu", "librnr_native.so")


class build_py_with_native(build_py):
    def run(self):
        if os.path.isfile(SRC):
            cxx = os.environ.get("CXX", "g++")
            cmd = [
                cxx, "-O3", "-fPIC", "-std=c++17", "-shared",
                "-o", OUT, SRC, "-lpng", "-ljpeg", "-lz", "-lpthread",
            ]
            try:
                subprocess.run(cmd, check=True, timeout=300)
            except Exception as e:  # toolchain-less install: fallbacks run
                print(f"[setup.py] native build skipped: {e}")
        super().run()


setup(cmdclass={"build_py": build_py_with_native})
