#!/usr/bin/env bash
# Build the native extensions in-place (run from the repo root).
set -euo pipefail
cd "$(dirname "$0")/../.."
python pointasnl_tpu/native/setup.py build_ext --inplace
