"""imgtool / obj2pbrt tools + native lexer equivalence."""

import numpy as np

from bre_tpu.io.image import read_pfm, write_pfm
from bre_tpu.tools.imgtool import main as imgtool_main
from bre_tpu.tools.obj2pbrt import obj_to_pbrt


def test_imgtool_diff(tmp_path, capsys):
    a = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32)
    b = a + 0.1
    pa, pb = tmp_path / "a.pfm", tmp_path / "b.pfm"
    write_pfm(pa, a)
    write_pfm(pb, b)
    assert imgtool_main(["diff", str(pa), str(pa)]) == 0
    rc = imgtool_main(["diff", str(pa), str(pb), "--tol", "0.001"])
    assert rc == 1  # MSE 0.01 > tol
    out = capsys.readouterr().out
    assert "MSE" in out


def test_imgtool_convert_assemble(tmp_path):
    a = np.random.RandomState(1).rand(4, 4, 3).astype(np.float32)
    pa = tmp_path / "a.pfm"
    write_pfm(pa, a)
    out = tmp_path / "scaled.pfm"
    assert imgtool_main(["convert", str(pa), str(out), "--scale", "2.0"]) == 0
    np.testing.assert_allclose(read_pfm(out), a * 2.0, rtol=1e-6)
    asm = tmp_path / "sum.pfm"
    assert imgtool_main(["assemble", str(asm), str(pa), str(pa)]) == 0
    np.testing.assert_allclose(read_pfm(asm), a * 2.0, rtol=1e-6)


def test_obj2pbrt_roundtrip(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    out = tmp_path / "tri.pbrt"
    assert obj_to_pbrt(obj, out) == 0
    from bre_tpu.scene.parser import parse_string

    txt = ('Film "image" "integer xresolution" 4 "integer yresolution" 4\n'
           "LookAt 0 0 -2 0 0 0 0 1 0\n"
           'Camera "perspective"\nWorldBegin\n'
           + out.read_text() + "\nWorldEnd\n")
    s = parse_string(txt).build()
    assert s.n_triangles == 2  # quad fan-triangulated


def test_native_lexer_matches_regex():
    from bre_tpu.native import tokenize_native
    from bre_tpu.scene.parser import _TOKEN_RE

    text = ('Shape "sphere" "float radius" [ 1.5 ] # a comment\n'
            'Translate 1 -2.5e-3 3 "string name" "with space"\n'
            "[ ] WorldBegin#trailing\nWorldEnd")
    want = [t for t in _TOKEN_RE.findall(text) if not t.startswith("#")]
    got = tokenize_native(text)
    assert got is not None, "native lexer failed to build"
    assert got == want


def test_imgtool_convert_postops(tmp_path):
    """imgtool convert post-ops (imgtool.cpp: bloom, repeatpix, flipy,
    tonemap/maxluminance)."""
    import numpy as np

    from bre_tpu.io.image import read_image, write_image
    from bre_tpu.tools.imgtool import main as imgtool_main

    img = np.zeros((8, 8, 3), np.float32)
    img[2, 3] = 10.0  # a firefly for bloom
    img[0, 0] = 0.5
    src = tmp_path / "a.pfm"
    write_image(str(src), img)

    out = tmp_path / "b.pfm"
    rc = imgtool_main([
        "convert", str(src), str(out), "--repeatpix", "2", "--flipy",
        "--bloomlevel", "5", "--bloomwidth", "1", "--bloomiters", "1",
    ])
    assert rc == 0
    res = np.asarray(read_image(str(out)))
    assert res.shape == (16, 16, 3)
    # flipy: the 0.5 pixel moved from row 0 to the bottom rows
    assert res[-1, 0, 0] >= 0.5
    # bloom spread energy around the firefly: source row 2 col 3 blurs to
    # rows 1-3 / cols 2-4, -> repeatpix rows 2-7 cols 4-9, -> flipy rows 8-13
    assert res[9, 5, 0] > 0.0
    assert (res[:, :, 0] > 0).sum() > 12

    rc = imgtool_main(["convert", str(src), str(out), "--tonemap",
                       "--maxluminance", "2.0"])
    assert rc == 0
    res = np.asarray(read_image(str(out)))
    assert res.max() <= 1.0
