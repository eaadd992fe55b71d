#!/bin/bash
# OpenADKit demo: auto_speed video visualization
# (reference: software_defined_vehicle/OpenADKit/*/launch-*.sh)
set -e
cd "$(dirname "$0")"
CKPT=""
if [ -f "model-weights/auto_speed.msgpack" ]; then
    CKPT="/opt/avp/model-weights/auto_speed.msgpack"
fi
docker run -it --rm \
    -v "$PWD"/model-weights:/opt/avp/model-weights \
    -v "$PWD"/../Test:/opt/avp/test \
    --entrypoint python visionpilot-tpu \
    -m autoware_vision_pilot_tpu.utils.video_viz \
    --model auto_speed \
    --checkpoint "$CKPT" \
    --video /opt/avp/test/traffic-driving.mp4 \
    --out /opt/avp/test/output_autospeed.avi
