// Stub OpenEXR Rgba header for the out-of-tree reference build: the openexr
// submodule is empty in this environment, and the comparison harness renders
// to PFM (imageio.cpp writes PFM natively), so the EXR path only needs to
// compile.  Any attempt to actually read/write EXR throws, which pbrt's
// existing try/catch turns into an Error() at runtime.
#ifndef SHIM_IMF_RGBA_H
#define SHIM_IMF_RGBA_H

namespace Imf {

struct Rgba {
    float r = 0, g = 0, b = 0, a = 1;
    Rgba() = default;
    Rgba(float r, float g, float b, float a = 1) : r(r), g(g), b(b), a(a) {}
};

}  // namespace Imf

namespace Imath {

struct V2i {
    int x = 0, y = 0;
    V2i() = default;
    V2i(int x, int y) : x(x), y(y) {}
};

struct Box2i {
    V2i min, max;
    Box2i() = default;
    Box2i(const V2i &mn, const V2i &mx) : min(mn), max(mx) {}
};

}  // namespace Imath

#endif  // SHIM_IMF_RGBA_H
