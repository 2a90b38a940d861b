"""Build the voxelrt_native C++ extension:

    cd native && python setup.py build_ext --inplace

or `make -C native`. The framework falls back to pure numpy/zlib paths when
the extension is absent (voxelrt/utils/native.py).
"""

from setuptools import Extension, setup

setup(
    name="voxelrt_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "voxelrt_native",
            sources=["voxelrt_native.cpp"],
            libraries=["z"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
        )
    ],
)
