"""One-off generator: transcribe the Hosek-Wilkie spectral sky datasets into
``bre_tpu/tools/data/hosek_spectral.npz``.

The coefficient tables are fitted DATA (Hosek & Wilkie, "An Analytic Model
for Full Spectral Sky-Dome Radiance", SIGGRAPH 2012), published with the
authors' reference implementation and vendored by pbrt at
/root/reference/src/ext/ArHosekSkyModelData_Spectral.h.  This script parses
that header's numeric arrays (run where the reference checkout exists) and
packs them:

- ``configs``   (11, 2, 10, 6, 9): per wavelength (320..720nm step 40),
                albedo (0/1), turbidity (1..10), quintic-Bezier elevation
                control point, 9 model coefficients A..I.
- ``radiances`` (11, 2, 10, 6): expected-value scale, same indexing minus
                the coefficient axis.
- ``solar``     (11, 10, 45, 4): direct solar radiance piecewise cubics per
                wavelength, turbidity, elevation piece, polynomial order.
- ``limb``      (11, 6): limb-darkening quintic coefficients per wavelength.

Usage:  python -m bre_tpu.tools.gen_hosek_data [header_path]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

HEADER = "/root/reference/src/ext/ArHosekSkyModelData_Spectral.h"
WAVELENGTHS = list(range(320, 721, 40))  # 11 bands


def _parse_arrays(text: str) -> dict:
    """Extract every ``double name[...] = { ... };`` numeric array."""
    out = {}
    for m in re.finditer(
        r"double\s+(\w+)\s*\[[^\]]*\]\s*=\s*\{(.*?)\};", text, re.S
    ):
        name, body = m.group(1), m.group(2)
        body = re.sub(r"//[^\n]*", "", body)  # strip // comments
        vals = re.findall(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?", body)
        out[name] = np.array([float(v) for v in vals], np.float64)
    # limbDarkeningDatasets are 2-D initializers of the per-wavelength arrays
    m = re.search(r"double\s+limbDarkeningDataset(\d+)\[\]", text)
    return out


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    header = Path(argv[0]) if argv else Path(HEADER)
    text = header.read_text()
    arrays = _parse_arrays(text)

    configs = np.zeros((11, 2, 10, 6, 9))
    radiances = np.zeros((11, 2, 10, 6))
    solar = np.zeros((11, 10, 45, 4))
    limb = np.zeros((11, 6))
    for wi, wl in enumerate(WAVELENGTHS):
        d = arrays[f"dataset{wl}"]
        assert d.size == 2 * 10 * 6 * 9, (wl, d.size)
        # layout (ArHosekSkyModel.c:164-231): albedo-major, then turbidity
        # blocks of 9*6, then 6 control points x 9 coefficients
        configs[wi] = d.reshape(2, 10, 6, 9)
        r = arrays[f"datasetRad{wl}"]
        assert r.size == 2 * 10 * 6, (wl, r.size)
        radiances[wi] = r.reshape(2, 10, 6)
        s = arrays[f"solarDataset{wl}"]
        assert s.size == 10 * 45 * 4, (wl, s.size)
        solar[wi] = s.reshape(10, 45, 4)
        l = arrays.get(f"limbDarkeningDataset{wl}")
        assert l is not None and l.size == 6, (wl,)
        limb[wi] = l

    out = Path(__file__).parent / "data" / "hosek_spectral.npz"
    out.parent.mkdir(exist_ok=True)
    np.savez_compressed(out, configs=configs, radiances=radiances,
                        solar=solar, limb=limb,
                        wavelengths=np.array(WAVELENGTHS, np.float64))
    print(f"wrote {out} ({out.stat().st_size/1024:.0f} KiB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
