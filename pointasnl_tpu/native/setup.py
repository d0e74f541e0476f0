"""Build the native extensions in-place:

    python pointasnl_tpu/native/setup.py build_ext --inplace
"""

import os

import numpy as np
from setuptools import Extension, setup

HERE = os.path.dirname(os.path.abspath(__file__))

setup(
    name="pointasnl_tpu_native",
    ext_modules=[
        Extension(
            "pointasnl_tpu.native.grid_subsampling_ext",
            sources=[os.path.join(HERE, "csrc", "grid_subsampling_ext.cpp")],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        ),
        Extension(
            "pointasnl_tpu.native.host_knn_ext",
            sources=[os.path.join(HERE, "csrc", "host_knn_ext.cpp")],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-fopenmp"],
            extra_link_args=["-fopenmp"],
            language="c++",
        ),
    ],
)
