"""Build the native host-runtime extension:

    python native/setup.py build_ext --build-lib ppl/llm/serving_tpu/utils/

(or `make -C native`, which does exactly that). The extension is optional:
utils/_native.py falls back to the pure-Python implementations when the
.so is absent or PPL_LLM_DISABLE_NATIVE=1.
"""

from setuptools import Extension, setup

setup(
    name="ppl_llm_host",
    ext_modules=[
        Extension(
            "ppl_llm_host",
            sources=["ppl_llm_host.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            language="c++",
        )
    ],
)
