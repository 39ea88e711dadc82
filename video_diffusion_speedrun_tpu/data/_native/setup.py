"""Build the fastload C++ extension:  python setup.py build_ext --inplace
(or scripts/build_native.sh from the repo root)."""

import numpy as np
from setuptools import Extension, setup

setup(
    name="fastload",
    ext_modules=[
        Extension(
            "fastload",
            sources=["fastload.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            language="c++",
        )
    ],
)
