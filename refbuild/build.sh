#!/bin/bash
# Out-of-tree build of the reference pbrt (/root/reference) without its empty
# git submodules (glog / openexr / zlib):
#   - glog        -> shim/glog/logging.h + shim/glog_shim.cpp (stderr logging)
#   - openexr     -> shim/Imf*.h stubs (EXR I/O throws at runtime; use .pfm)
#   - zlib        -> system zlib (/usr/include/zlib.h, -lz)
# The generated flex/bison sources are checked in upstream, so no flex/bison
# needed.  Nothing in /root/reference is modified; all outputs land here.
#
# Usage: bash refbuild/build.sh   -> refbuild/pbrt
set -e
cd "$(dirname "$0")"
REF=/root/reference/src
OBJ=obj
mkdir -p $OBJ

CXX=g++
CC=gcc
CXXFLAGS="-std=gnu++11 -O2 -DNDEBUG -w -Ishim -I$REF -I$REF/core -I$REF/ext -pthread"
CFLAGS="-O2 -DNDEBUG -w"

SRCS=$(ls $REF/core/*.cpp $REF/shapes/*.cpp $REF/materials/*.cpp \
          $REF/lights/*.cpp $REF/cameras/*.cpp $REF/samplers/*.cpp \
          $REF/filters/*.cpp $REF/textures/*.cpp $REF/media/*.cpp \
          $REF/accelerators/*.cpp $REF/integrators/*.cpp $REF/main/pbrt.cpp \
          $REF/ext/lodepng.cpp $REF/ext/targa.cpp $REF/ext/rply.cpp)

PIDS=()
for src in $SRCS shim/glog_shim.cpp; do
    obj=$OBJ/$(echo "$src" | sed 's|/|_|g; s|\.cpp$|.o|')
    if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
        $CXX $CXXFLAGS -c "$src" -o "$obj" &
        PIDS+=($!)
        # keep at most nproc compiles in flight
        while [ "$(jobs -r | wc -l)" -ge "$(nproc)" ]; do wait -n; done
    fi
done
cobj=$OBJ/ext_ArHosekSkyModel.o
if [ ! -f $cobj ] || [ $REF/ext/ArHosekSkyModel.c -nt $cobj ]; then
    $CC $CFLAGS -c $REF/ext/ArHosekSkyModel.c -o $cobj &
fi
wait

$CXX $CXXFLAGS $OBJ/*.o -o pbrt -lz -lpthread
echo "built: $(pwd)/pbrt"
