#!/bin/sh
# Package the pure-Python engine for the Pyodide WASM host.
# Run from this directory; output: ./cozo_tpu.zip
set -e
cd "$(dirname "$0")/../.."
rm -f ffi/wasm/cozo_tpu.zip
zip -qr ffi/wasm/cozo_tpu.zip cozo_tpu \
    -x "cozo_tpu/**/__pycache__/*" -x "*.so" -x "*.pyc"
echo "wrote ffi/wasm/cozo_tpu.zip"
