"""Test configuration: run all tests on a virtual 8-device CPU mesh so
host-logic and sharding tests need no TPU hardware (SURVEY.md section 4)."""

import os
import sys

# Must run before the first `import jax` anywhere in the test session.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the generator e2e tests compile dozens of
# (bucket, feed, block) step variants; cache them across test runs
# (repo-local so the driver's ~/.cache wipe can't cold-start the suite).
from ppl.llm.serving_tpu.utils.compile_cache import configure  # noqa: E402

configure(jax, flavor="cpu", min_compile_secs=1.0)
