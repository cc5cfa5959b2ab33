#!/usr/bin/env python3
"""Checkout shim: the tool lives at ppl.llm.serving_tpu.tools.microbench_tunnel."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppl.llm.serving_tpu.tools.microbench_tunnel import main

if __name__ == "__main__":
    main()
