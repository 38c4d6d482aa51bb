#!/usr/bin/env bash
# Build the fastatomic native extension into native/.
set -euo pipefail
cd "$(dirname "$0")"
PY_INC=$(python -c 'import sysconfig; print(sysconfig.get_paths()["include"])')
NP_INC=$(python -c 'import numpy; print(numpy.get_include())')
SUFFIX=$(python -c 'import sysconfig; print(sysconfig.get_config_var("EXT_SUFFIX"))')
g++ -O3 -std=c++17 -shared -fPIC -pthread fastatomic.cpp -o "fastatomic${SUFFIX}" \
    -I"${PY_INC}" -I"${NP_INC}"
echo "built fastatomic${SUFFIX}"
