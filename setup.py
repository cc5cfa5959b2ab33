"""Optional native host-runtime extension build (pure-Python fallbacks
exist — utils/_native.py): `pip install -e .` works without a compiler;
with one, the C++ allocators/prefix-cache build in-place."""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "ppl.llm.serving_tpu.utils.ppl_llm_host",
            sources=["native/ppl_llm_host.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            language="c++",
            optional=True,   # build failure must not fail the install
        )
    ],
)
