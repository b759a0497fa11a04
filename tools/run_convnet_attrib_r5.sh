#!/bin/bash
# Round-5 task 2: trace+parse the four suite programs, then diff.
# Sequential — ONE TPU process at a time.
cd /root/repo
set -x
run_one() {  # model batch precision short
  timeout 580 python tools/profile_convnet_r5.py trace --model $1 --batch $2 --precision $3 || return 1
  timeout 300 python tools/profile_r3.py parse \
      --logdir /tmp/anakin_cnn_$1_b$2_$3 \
      --out artifacts/profile_$4_$3.json || return 1
}
run_one resnet101 1 bf16 r101_b1 && \
run_one resnet101 1 int8 r101_b1 && \
run_one resnet50 8 bf16 r50_b8 && \
run_one resnet50 8 int8 r50_b8 && \
timeout 120 python tools/profile_convnet_r5.py diff \
    --a artifacts/profile_r101_b1_bf16.json \
    --b artifacts/profile_r101_b1_int8.json \
    --out artifacts/convnet_attribution_r5_r101b1.json && \
timeout 120 python tools/profile_convnet_r5.py diff \
    --a artifacts/profile_r50_b8_bf16.json \
    --b artifacts/profile_r50_b8_int8.json \
    --out artifacts/convnet_attribution_r5_r50b8.json
echo "ATTRIB DONE rc=$?"
