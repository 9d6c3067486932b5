#!/bin/bash
# Round-11 streaming scale tour (VERDICT r10 item 5): the four untoured twins.
set -x
cd /root/repo
python tools/stress_streaming.py --sf-dir /root/repo/.benchdata/sf100ev \
  --batches 10 --ops attribution > .sweeps/r11_stream_attribution.json 2> .sweeps/r11_stream_attribution.log
python tools/stress_streaming.py --sf-dir /root/repo/.benchdata/sf100 --table documents \
  --batches 10 --ops dedup cms bloom > .sweeps/r11_stream_docs.json 2> .sweeps/r11_stream_docs.log
touch .sweeps/r11_streaming.done
