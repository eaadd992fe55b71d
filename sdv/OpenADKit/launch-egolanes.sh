#!/bin/bash
# OpenADKit demo: ego_lanes video visualization
# (reference: software_defined_vehicle/OpenADKit/*/launch-*.sh)
set -e
cd "$(dirname "$0")"
CKPT=""
if [ -f "model-weights/ego_lanes.msgpack" ]; then
    CKPT="/opt/avp/model-weights/ego_lanes.msgpack"
fi
docker run -it --rm \
    -v "$PWD"/model-weights:/opt/avp/model-weights \
    -v "$PWD"/../Test:/opt/avp/test \
    --entrypoint python visionpilot-tpu \
    -m autoware_vision_pilot_tpu.utils.video_viz \
    --model ego_lanes \
    --checkpoint "$CKPT" \
    --video /opt/avp/test/traffic-driving.mp4 \
    --out /opt/avp/test/output_egolanes.avi
