#!/bin/bash
# Build the libav media shim → libest_media.so (next to this script).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 est_media.cpp -o libest_media.so \
    -I/usr/include/x86_64-linux-gnu \
    -lavformat -lavcodec -lavutil -lswresample -lswscale
echo "built $(pwd)/libest_media.so"
