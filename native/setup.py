"""Build the native serializer extension.

    python native/setup.py build_ext --inplace

drops ``_libclsph_native.*.so`` into the repo root, where
libclsph_tpu.io.geo_format picks it up automatically (falling back to
the pure-NumPy writer when absent).
"""

from setuptools import Extension, setup

setup(
    name="libclsph-tpu-native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "_libclsph_native",
            sources=["native/geo_writer.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
        )
    ],
)
