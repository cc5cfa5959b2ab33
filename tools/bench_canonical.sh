#!/usr/bin/env bash
# Canonical throughput benchmark — the BASELINE.json defined metric:
# output tokens/s/chip + p50 TTFT at --request-rate inf on a ShareGPT-
# style workload through the gRPC server, reference methodology
# /root/reference/tools/client_qps_measure.cc:318-350.
#
# Pipeline: gen_samples -> llm_server (random weights, i8i8 + int8 KV,
# Pallas kernels) -> client_qps_measure. Token-in-out mode (like the
# reference's client_qps_measure_token_in_out) so no real tokenizer
# files are needed; lengths still come from the tokenized ShareGPT-style
# texts.
#
#   MODEL=tinyllama|7b  EARLY=0|1 (EOS-stopping traffic)  NREQ=256
#   RATE=inf  PORT=23401  bash tools/bench_canonical.sh
set -u
cd "$(dirname "$0")/.."

MODEL=${MODEL:-tinyllama}
PORT=${PORT:-23401}
RATE=${RATE:-inf}
NREQ=${NREQ:-256}
EARLY=${EARLY:-0}
TAG=${TAG:-$MODEL}
SAMPLES=${SAMPLES:-/tmp/samples_canonical.json}
PARAMS=/tmp/params_canonical_${MODEL}.json
SERVER_LOG=/tmp/canonical_server_${TAG}.log
CLIENT_LOG=/tmp/canonical_client_${TAG}.log

if [ "$MODEL" = "tiny" ]; then   # CPU smoke of the whole pipeline
  cat > "$PARAMS" <<EOF
{"num_heads": 4, "num_kv_heads": 2, "num_layers": 2,
 "hidden_dim": 64, "intermediate_dim": 128, "vocab_size": 256,
 "cache_quant_bit": 0, "cache_quant_group": 1, "cache_layout": 0,
 "cache_mode": 1, "page_size": 16, "dynamic_batching": true,
 "auto_causal": true, "dtype": "float32"}
EOF
  KV_TOKENS=${KV_TOKENS:-8192}
  EXTRA="--dtype float32 --max-running-batch 16 --max-prefill-batch 8"
  BUCKETS="--token-buckets 256,1024 --batch-buckets 8,16"
  NREQ=${NREQ_OVERRIDE:-8}
elif [ "$MODEL" = "7b" ]; then
  cat > "$PARAMS" <<EOF
{"num_heads": 32, "num_kv_heads": 32, "num_layers": 32,
 "hidden_dim": 4096, "intermediate_dim": 11008, "vocab_size": 32000,
 "cache_quant_bit": 8, "cache_quant_group": 8, "cache_layout": 0,
 "cache_mode": 1, "page_size": 128, "dynamic_batching": true,
 "auto_causal": true, "dtype": "bfloat16"}
EOF
  KV_TOKENS=${KV_TOKENS:-16384}
  EXTRA="--quantize-lm-head --max-running-batch 64 --max-prefill-batch 32"
  # finer token buckets bound padding waste on ShareGPT-length prompts
  # (mean ~200 tok: bucket 256 instead of 1024 = 4x less padded prefill)
  BUCKETS="--token-buckets 256,512,1024,2048,4096 --batch-buckets 32,64"
else
  cat > "$PARAMS" <<EOF
{"num_heads": 32, "num_kv_heads": 4, "num_layers": 22,
 "hidden_dim": 2048, "intermediate_dim": 5632, "vocab_size": 32000,
 "cache_quant_bit": 8, "cache_quant_group": 8, "cache_layout": 0,
 "cache_mode": 1, "page_size": 128, "dynamic_batching": true,
 "auto_causal": true, "dtype": "bfloat16"}
EOF
  # grid sized to fit HBM: the original 256-batch bucket compiled a
  # 17.56 GB program once the stream-concurrency fix let the running
  # batch actually REACH 189+ (round-3 run 3: engine fail-all, 148
  # failed requests). 128 + a 96k-token pool fits.
  KV_TOKENS=${KV_TOKENS:-98304}
  # (bucket-grid validation is ON by default: the extreme decode AND
  # mixed-prefill buckets compile at startup and clamp — never a
  # mid-serving fail-all)
  EXTRA=${EXTRA:-"--max-running-batch 128 --max-prefill-batch 64"}
  # finer token buckets bound padding waste on ShareGPT-length prompts
  # (mean ~200 tok: bucket 256 instead of 1024 = 4x less padded prefill)
  BUCKETS=${BUCKETS:-"--token-buckets 256,512,1024,2048,4096 --batch-buckets 64,128"}
fi

# WORKLOAD=sharegpt (default): length-matched to the reference's
# ShareGPT samples_1024.json (prompt mean ~200 tok, answer ~180, heavy
# tail — client_qps_measure.cc:54-132). WORKLOAD=light: the short mix
# used by earlier diagnostic rounds.
WORKLOAD=${WORKLOAD:-sharegpt}
if [ "$MODEL" = "tiny" ] || [ "$WORKLOAD" = "light" ]; then
  GEN_ARGS="--prompt-mean 32 --answer-mean 64"
else
  GEN_ARGS="--sharegpt-mix"
fi
python tools/gen_samples.py --output "$SAMPLES" --count "$NREQ" \
  $GEN_ARGS || exit 1

# the manifest records every step-program key the run visits; a rerun
# (or the EARLY=1 leg) precompiles them BEFORE taking traffic, where the
# persistent disk cache makes them fast — without it the warm pass
# crawls through first-visit bucket compiles one at a time as the
# running batch ramps. Keyed by the full shape-affecting config, not
# just MODEL: a stale manifest from a different bucket grid would feed
# prewarm keys that can never compile (and they'd accumulate forever).
CFG_HASH=$(printf '%s|%s|%s' "$KV_TOKENS" "$BUCKETS" "$EXTRA" | cksum | cut -d' ' -f1)
MANIFEST=${MANIFEST:-/tmp/canonical_manifest_${MODEL}_${CFG_HASH}.json}
ES_FLAG=""
[ "$EARLY" = "1" ] && ES_FLAG="--early-stopping"
WARMREQ=${WARMREQ:-$NREQ}
WARM_LOG=/tmp/canonical_warm_${TAG}.log

# launch + warm, with ONE retry: the axon TPU worker can crash on a
# first-visit mid-serving compile (remote-helper fragility). Every
# program the dead server compiled is already AOT-persisted, so a
# restart comes up in minutes and the retry warm pass has nothing
# left to compile.
warm_ok=0
for attempt in 1 2; do
  python tools/llm_server.py \
    --model-format random --model-param-path "$PARAMS" \
    --tokenizer-type dummy --quant-method online_i8i8 \
    --kv-cache-max-tokens "$KV_TOKENS" --multi-step 16 \
    --speculative-blocks 1 --max-tokens-per-step 8192 \
    --attention-seq-block 8 $BUCKETS $EXTRA \
    --warmup-manifest "$MANIFEST" \
    --enable-profiling --profile-step-interval "${PROFILE_EVERY:-100}" \
    --disable-log-req \
    --port "$PORT" > "${SERVER_LOG}.$attempt" 2>&1 &
  ln -sf "${SERVER_LOG}.$attempt" "$SERVER_LOG"
  SERVER_PID=$!
  trap 'kill $SERVER_PID 2>/dev/null' EXIT

  echo "attempt $attempt: waiting for server (pid $SERVER_PID, log $SERVER_LOG)..."
  # cold grid validation compiles through the tunnel run ~20 min; allow 60
  for i in $(seq 1 1800); do
    grep -q "listening" "$SERVER_LOG" && break
    kill -0 $SERVER_PID 2>/dev/null || break
    sleep 2
  done
  if ! grep -q "listening" "$SERVER_LOG"; then
    echo "server never came up (attempt $attempt)"; tail -5 "$SERVER_LOG"
    kill $SERVER_PID 2>/dev/null; wait $SERVER_PID 2>/dev/null
    continue
  fi
  echo "server listening after $((i * 2))s"

  # warm the compiled-shape grid before measuring. The pass must reach
  # the same running-batch / page-bucket shapes as the measured run, or
  # fresh tunnel compiles (minutes each) land INSIDE the measurement —
  # the first round-3 attempt warmed with 16 requests and measured 171
  # tok/s instead of the real number. Warm with the full request count.
  python tools/client_qps_measure.py --target "127.0.0.1:$PORT" \
    --dataset "$SAMPLES" --num-requests "$WARMREQ" --request-rate inf \
    --token-in-out $ES_FLAG > "$WARM_LOG" 2>&1
  grep -E "finished|tokens out" "$WARM_LOG"
  if grep -qE "\(failed 0\)" "$WARM_LOG"; then
    warm_ok=1
    break
  fi
  echo "warm pass had failures (attempt $attempt; see $WARM_LOG, $SERVER_LOG)"
  kill $SERVER_PID 2>/dev/null; wait $SERVER_PID 2>/dev/null; trap - EXIT
done
# a warm pass with failures means the grid/backend is broken — the
# measured pass would only produce another diagnostic number
if [ "$warm_ok" != "1" ]; then
  echo "ABORT: warm pass had failures twice"
  exit 1
fi

python tools/client_qps_measure.py --target "127.0.0.1:$PORT" \
  --dataset "$SAMPLES" --num-requests "$NREQ" --request-rate "$RATE" \
  --token-in-out $ES_FLAG 2>&1 | tee "$CLIENT_LOG"

kill $SERVER_PID 2>/dev/null
wait $SERVER_PID 2>/dev/null
trap - EXIT
echo "done: client log $CLIENT_LOG, server log $SERVER_LOG"
