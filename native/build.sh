#!/bin/sh
# Build the native host-runtime library.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libpearl_host.so block_manager.cc
echo "built native/libpearl_host.so"
