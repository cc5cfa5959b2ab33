#!/usr/bin/env python3
"""Generate a synthetic ShareGPT-style workload file in the reference's
samples_1024.json format (``client_qps_measure.cc:54-96`` expects
[{"conversations": [{"from": "human", "value": prompt},
                    {"from": "gpt", "value": answer}]}, ...]).

The reference ships real ShareGPT dumps; this generator produces
length-distribution-matched synthetic text so benchmarks run in a
zero-egress environment. A real samples_1024.json drops in unchanged.
"""

import argparse
import json
import random

WORDS = ("the of and a to in is you that it he was for on are as with his "
         "they I at be this have from or one had by word but not what all "
         "were we when your can said there use an each which she do how "
         "their if will up other about out many then them these so some her "
         "would make like him into time has look two more write go see "
         "number no way could people my than first water been call who oil "
         "its now find long down day did get come made may part").split()


def make_text(rng, n_words):
    return " ".join(rng.choice(WORDS) for _ in range(n_words))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output", default="samples_synthetic.json")
    p.add_argument("--count", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    # ShareGPT-ish length stats (words): prompts short-ish, answers longer
    p.add_argument("--prompt-mean", type=int, default=48)
    p.add_argument("--answer-mean", type=int, default=128)
    args = p.parse_args()

    rng = random.Random(args.seed)
    out = []
    for _ in range(args.count):
        p_len = max(3, int(rng.lognormvariate(0, 0.6) * args.prompt_mean))
        a_len = max(8, int(rng.lognormvariate(0, 0.7) * args.answer_mean))
        out.append({"conversations": [
            {"from": "human", "value": make_text(rng, min(p_len, 1500))},
            {"from": "gpt", "value": make_text(rng, min(a_len, 1500))},
        ]})
    with open(args.output, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(out)} conversations to {args.output}")


if __name__ == "__main__":
    main()
