#!/bin/bash
# Builds the C++ reference renderer (TheBounty, /root/reference) as a single
# static golden-image driver, bypassing CMake (libxml2 is unavailable, so the
# XML frontend is excluded; scenes are built via the embedding API instead).
# Each plugin TU is compiled with -DregisterPlugin=registerPlugin_<name> so
# the statically-linked registration entry points do not collide.
set -e
cd "$(dirname "$0")"
REF=/root/reference
OUT=build
mkdir -p $OUT

CXX=${CXX:-g++}
FLAGS="-O2 -w -std=gnu++14 -fpermissive -I. -I$REF/include -DFAST_MATH -DFAST_TRIG"

CORE_SRCS=$(ls $REF/src/yafraycore/*.cc | grep -v xmlparser)

objs=()
compile() { # compile <src> <obj> [extra flags]
  local src=$1 obj=$OUT/$2; shift 2
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    $CXX $FLAGS "$@" -c "$src" -o "$obj" &
  fi
  objs+=("$obj")
}

for f in $CORE_SRCS; do
  compile "$f" "core_$(basename $f .cc).o"
done
compile $REF/src/interface/yafrayinterface.cc iface.o

compile $REF/src/integrators/directlight.cc p_directlight.o -DregisterPlugin=registerPlugin_directlight
compile $REF/src/integrators/pathtracer.cc p_pathtracer.o -DregisterPlugin=registerPlugin_pathtracer
compile $REF/src/integrators/photonintegr.cc p_photonintegr.o -DregisterPlugin=registerPlugin_photonmapping
compile $REF/src/integrators/sppm.cc p_sppm.o -DregisterPlugin=registerPlugin_sppm
compile $REF/src/integrators/bidirpath.cc p_bidirpath.o -DregisterPlugin=registerPlugin_bidirectional
compile $REF/src/integrators/EmptyVolumeIntegrator.cc p_emptyvol.o -DregisterPlugin=registerPlugin_emptyvol
compile $REF/src/materials/shinydiffuse.cc p_shinydiffuse.o -DregisterPlugin=registerPlugin_shinydiffuse
compile $REF/src/materials/simple.cc p_simplemat.o -DregisterPlugin=registerPlugin_simplemat
compile $REF/src/materials/mask.cc p_maskmat.o
compile $REF/src/materials/glossy2.cc p_glossy.o -DregisterPlugin=registerPlugin_glossy
compile $REF/src/materials/glass.cc p_glass.o -DregisterPlugin=registerPlugin_glass
compile $REF/src/materials/blend.cc p_blend.o -DregisterPlugin=registerPlugin_blend
compile $REF/src/lights/arealight.cc p_arealight.o -DregisterPlugin=registerPlugin_arealight
compile $REF/src/lights/bgportallight.cc p_bgportal.o
compile $REF/src/lights/meshlight.cc p_meshlight.o
compile $REF/src/cameras/architectCamera.cc p_cam_arch.o -DregisterPlugin=registerPlugin_cameras
compile $REF/src/cameras/perspectiveCamera.cc p_cam_persp.o

# mesh+IBL golden driver TUs (textures, nodes, image handler, background)
compile $REF/src/textures/basictex.cc p_textures.o -DregisterPlugin=registerPlugin_textures
compile $REF/src/textures/imagetex.cc p_imagetex.o
compile $REF/src/textures/basicnodes.cc p_nodes.o -DregisterPlugin=registerPlugin_nodes
compile $REF/src/textures/layernode.cc p_layernode.o
compile $REF/src/textures/noise.cc p_noise.o
compile $REF/src/image_handlers/tgaHandler.cc p_tga.o -DregisterPlugin=registerPlugin_tga
compile $REF/src/backgrounds/textureback.cc p_textureback.o -DregisterPlugin=registerPlugin_textureback
compile $REF/src/lights/bglight.cc p_bglight.o -DregisterPlugin=registerPlugin_bglight

compile $REF/src/lights/spotlight.cc p_spotlight.o -DregisterPlugin=registerPlugin_spotlight
compile $REF/src/volumes/UniformVolume.cc p_uniformvol.o -DregisterPlugin=registerPlugin_uniformvol
compile $REF/src/integrators/SingleScatterIntegrator.cc p_singlescatter.o -DregisterPlugin=registerPlugin_singlescatter

compile driver.cc driver.o
compile driver_ms.cc driver_ms.o
compile driver_vol.cc driver_vol.o
wait

common=()
for o in "${objs[@]}"; do
  case "$o" in
    */driver.o|*/driver_ms.o|*/driver_vol.o) ;;
    *) common+=("$o") ;;
  esac
done
$CXX -O2 -o $OUT/refdriver $OUT/driver.o "${common[@]}" -lpthread -ldl
$CXX -O2 -o $OUT/refdriver_ms $OUT/driver_ms.o "${common[@]}" -lpthread -ldl
$CXX -O2 -o $OUT/refdriver_vol $OUT/driver_vol.o "${common[@]}" -lpthread -ldl
echo "built $OUT/refdriver $OUT/refdriver_ms $OUT/refdriver_vol"
