"""C ABI host (native/cozo_c.cpp + cozo_c.h): build the shared library,
compile the C example against it, run end-to-end (reference parity:
cozo-lib-c/src/lib.rs:44-323)."""

import os
import subprocess
import sys
import sysconfig

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "native")


def test_c_abi_end_to_end(tmp_path):
    libdir = sysconfig.get_config_var("LIBDIR")
    pyver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    inc = sysconfig.get_paths()["include"]
    so = os.path.join(NATIVE, "libcozo_c.so")
    src = os.path.join(NATIVE, "cozo_c.cpp")
    if not os.path.exists(so) or os.path.getmtime(src) > os.path.getmtime(so):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", so,
             f"-I{inc}", f"-L{libdir}", f"-l{pyver}"],
            check=True, capture_output=True,
        )
    exe = str(tmp_path / "c_smoke")
    subprocess.run(
        ["gcc", "-O2", os.path.join(NATIVE, "example_c_host.c"),
         f"-I{NATIVE}", f"-L{NATIVE}", "-lcozo_c", f"-L{libdir}", f"-l{pyver}",
         "-o", exe],
        check=True, capture_output=True,
    )
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = f"{NATIVE}:{libdir}"
    env["PYTHONPATH"] = ROOT
    out = subprocess.run(
        [exe], env=env, capture_output=True, text=True, timeout=300, cwd=ROOT
    )
    assert "C_ABI_OK" in out.stdout, (out.stdout, out.stderr[-1500:])
