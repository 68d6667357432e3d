#!/bin/bash
# Build the golden-dump driver against an out-of-tree reference build.
# Usage: REF=/root/reference BUILD=/tmp/refbuild bash tools/parity/build_ref.sh
set -e
REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
g++ -O2 -std=c++20 -fopenmp -include cstddef \
  -DSYMX_CODEGEN_DIR=\"/tmp/symx_codegen\" \
  -I$REF/stark/include -I$REF/stark/src \
  -I$REF/stark/extern/symx/include -I$REF/stark/extern/symx/src \
  -I$REF/stark/extern/symx/extern/Eigen \
  -I$REF/stark/extern/symx/extern/picoSHA2/include \
  -I$REF/stark/extern/symx/extern/fmt/include \
  -I$REF/stark/extern/symx/extern/BlockedSparseMatrix/include \
  -I$REF/stark/extern/tinyobjloader/include \
  -I$REF/stark/extern/par_shapes/include \
  -I$REF/stark/extern/TriangleMeshCollisionDetection/include \
  -I$REF/stark/extern/TriangleMeshDistance/include \
  -I$REF/stark/extern/vtkio/include \
  "$(dirname "$0")/ref_dump.cpp" \
  $BUILD/stark/libstark.a \
  $BUILD/stark/extern/TriangleMeshCollisionDetection/libTriangleMeshCollisionDetection.a \
  $BUILD/stark/extern/symx/libsymx.a \
  $BUILD/stark/extern/symx/extern/fmt/libfmt.a \
  -ldl -o /tmp/ref_dump
echo built /tmp/ref_dump
