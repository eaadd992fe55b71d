#!/bin/bash
# OpenADKit demo: the full dual lateral+longitudinal application loop
set -e
cd "$(dirname "$0")"
docker run -it --rm \
    -v "$PWD"/model-weights:/opt/avp/model-weights \
    -v "$PWD"/../Test:/opt/avp/test \
    visionpilot-tpu \
    --config configs/visionpilot.conf.example \
    --video /opt/avp/test/traffic-driving.mp4
