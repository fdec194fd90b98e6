"""Build hook: compile the C++ host runtime into the package.

The native runtime (native/dy4_runtime.cpp — SPSC rings, I/O threads,
batched RDS frame sync) is a plain shared library loaded via ctypes, not
a CPython extension, so we compile it with a small custom build step
instead of Extension/build_ext machinery.  Wheels ship it as package
data at dy4tpu/_native/libdy4runtime.so; editable installs keep using
the repo-layout native/ build (dy4tpu/runtime/native.py searches both).
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = os.path.dirname(os.path.abspath(__file__))
        native = os.path.join(root, "native")
        so = os.path.join(native, "libdy4runtime.so")
        try:
            subprocess.run(["make", "-C", native, "-s"], check=True)
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"warning: native runtime build failed ({e}); "
                  "installing pure-Python (host fleet layers degrade "
                  "to the scalar decoders)")
        super().run()
        if os.path.exists(so) and self.build_lib:
            dst = os.path.join(self.build_lib, "dy4tpu", "_native")
            os.makedirs(dst, exist_ok=True)
            shutil.copy2(so, dst)


setup(cmdclass={"build_py": BuildWithNative})
