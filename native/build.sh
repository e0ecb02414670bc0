#!/bin/sh
# Build the native components into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -shared -fPIC -std=c++17 -o lib/libsafetensors_reader.so \
    safetensors_reader.cc -lpthread
g++ -O3 -shared -fPIC -std=c++17 -o lib/libtext_metrics.so text_metrics.cc
echo "built native/lib/{libsafetensors_reader,libtext_metrics}.so"
