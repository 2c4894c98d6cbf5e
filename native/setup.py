"""Build the native extension:  cd native && python setup.py build_ext --inplace
Installs rtfs_net_tpu_native into the repo root so the PESQ dispatcher and
TB writer can pick it up."""
import os

from setuptools import Extension, setup

HERE = os.path.dirname(os.path.abspath(__file__))

setup(
    name="rtfs_net_tpu_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "rtfs_net_tpu_native",
            sources=[os.path.join(HERE, "module.cpp"),
                     os.path.join(HERE, "pesq_core.cpp")],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        )
    ],
)
