#!/bin/bash
# Build native components (C++ CPython extensions).
set -euo pipefail
cd "$(dirname "$0")/../video_diffusion_speedrun_tpu/data/_native"
python setup.py build_ext --inplace
echo "built: $(ls *.so)"
