"""Build the native fastatomic extension in-place:

    python native/setup.py build_ext --inplace

The .so lands next to this file; recbole_cdr_tpu.data.atomic picks it up
automatically (pure-python pandas path is the fallback).
"""

import os

import numpy as np
from setuptools import Extension, setup

here = os.path.dirname(os.path.abspath(__file__))

setup(
    name="recbole_cdr_tpu_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "fastatomic",
            sources=[os.path.join(here, "fastatomic.cpp")],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
            language="c++",
        )
    ],
    script_args=["build_ext", "--inplace", "--build-lib", here, "--build-temp",
                 os.path.join(here, ".build")],
)
