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


def make_text_bytes(rng, n_bytes):
    """Text whose utf-8 byte length is exactly ``n_bytes`` — so the
    benchmark ByteTokenizer (tokens = bytes + bos) hits the sampled
    token count, making the workload's token distribution explicit."""
    parts, total = [], 0
    while total < n_bytes:
        w = rng.choice(WORDS)
        parts.append(w)
        total += len(w) + 1  # + separating space
    text = " ".join(parts)[:n_bytes]
    return text if text.strip() else "x" * n_bytes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output", default="samples_synthetic.json")
    p.add_argument("--count", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    # ShareGPT-ish length stats: prompts short-ish, answers longer
    p.add_argument("--prompt-mean", type=int, default=48)
    p.add_argument("--answer-mean", type=int, default=128)
    p.add_argument("--unit", default="words", choices=["words", "tokens"],
                   help="'tokens' sizes texts in ByteTokenizer tokens "
                        "(bytes), so --*-mean are token means directly")
    p.add_argument("--sharegpt-mix", action="store_true",
                   help="preset matching the reference's ShareGPT "
                        "samples_1024.json length statistics "
                        "(client_qps_measure.cc:54-132): log-normal, "
                        "prompt mean ~200 tok, answer mean ~180 tok, "
                        "heavy tail, 1500-token cap")
    args = p.parse_args()

    if args.sharegpt_mix:
        args.unit = "tokens"
        args.prompt_mean, args.answer_mean = 200, 180
        sig_p, sig_a = 0.9, 0.8       # heavy tails: p95 ~ 4x the mean
    else:
        sig_p, sig_a = 0.6, 0.7

    rng = random.Random(args.seed)
    out = []
    for _ in range(args.count):
        # lognormvariate(0, s) has mean exp(s^2/2); divide it out so
        # --*-mean is the actual mean of the sampled lengths
        p_len = max(4, int(rng.lognormvariate(0, sig_p)
                           / pow(2.718281828, sig_p * sig_p / 2)
                           * args.prompt_mean))
        a_len = max(8, int(rng.lognormvariate(0, sig_a)
                           / pow(2.718281828, sig_a * sig_a / 2)
                           * args.answer_mean))
        if args.unit == "tokens":
            human = make_text_bytes(rng, min(p_len, 1500))
            gpt = make_text_bytes(rng, min(a_len, 1500))
        else:
            human = make_text(rng, min(p_len, 1500))
            gpt = make_text(rng, min(a_len, 1500))
        out.append({"conversations": [
            {"from": "human", "value": human},
            {"from": "gpt", "value": gpt},
        ]})
    with open(args.output, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(out)} conversations to {args.output}")


if __name__ == "__main__":
    main()
