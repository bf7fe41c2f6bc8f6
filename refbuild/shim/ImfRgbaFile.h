// Stub OpenEXR RgbaFile header — see ImfRgba.h for rationale.  Constructors
// throw so pbrt's try/catch reports "Unable to read/write image" instead of
// silently mis-reading; the harness uses PFM output exclusively.
#ifndef SHIM_IMF_RGBA_FILE_H
#define SHIM_IMF_RGBA_FILE_H

#include <stdexcept>
#include "ImfRgba.h"

namespace Imf {

enum RgbaChannels { WRITE_RGBA = 0, WRITE_RGB = 1 };

class RgbaInputFile {
  public:
    explicit RgbaInputFile(const char *) {
        throw std::runtime_error("EXR support not built (openexr submodule absent); use .pfm");
    }
    Imath::Box2i dataWindow() const { return {}; }
    Imath::Box2i displayWindow() const { return {}; }
    void setFrameBuffer(Rgba *, size_t, size_t) {}
    void readPixels(int, int) {}
};

class RgbaOutputFile {
  public:
    RgbaOutputFile(const char *, const Imath::Box2i &, const Imath::Box2i &,
                   RgbaChannels) {
        throw std::runtime_error("EXR support not built (openexr submodule absent); use .pfm");
    }
    void setFrameBuffer(const Rgba *, size_t, size_t) {}
    void writePixels(int) {}
};

}  // namespace Imf

#endif  // SHIM_IMF_RGBA_FILE_H
