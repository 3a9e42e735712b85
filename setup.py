"""Build the native extensions: python setup.py build_ext --inplace"""
from setuptools import Extension, setup

setup(
    name="svt_av1_tpu",
    version="0.1.0",
    packages=["svt_av1_tpu"],
    ext_modules=[
        Extension(
            "svt_av1_tpu.native.ec_native",
            sources=["svt_av1_tpu/native/ec_native.c"],
            extra_compile_args=["-O3", "-std=c11", "-march=native"],
        ),
        Extension(
            "svt_av1_tpu.native.tx_native",
            sources=["svt_av1_tpu/native/tx_native.c"],
            extra_compile_args=["-O3", "-std=c11", "-march=native"],
        ),
        Extension(
            "svt_av1_tpu.native.block_native",
            sources=["svt_av1_tpu/native/block_native.c"],
            extra_compile_args=["-O3", "-std=c11", "-march=native"],
        ),
        Extension(
            "svt_av1_tpu.native.coder_native",
            sources=["svt_av1_tpu/native/coder_native.c"],
            extra_compile_args=["-O3", "-std=c11", "-march=native"],
        ),
    ],
)
