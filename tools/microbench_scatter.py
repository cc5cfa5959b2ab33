#!/usr/bin/env python3
"""Checkout shim: the tool lives at ppl.llm.serving_tpu.tools.microbench_scatter
(pip-installable, console entry point in pyproject.toml); this keeps
`python tools/microbench_scatter.py` working from a repo checkout."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppl.llm.serving_tpu.tools.microbench_scatter import main

if __name__ == "__main__":
    main()
