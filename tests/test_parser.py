"""Parser tests: .pbrt subset -> Scene, and the CLI end-to-end."""

import numpy as np

from bre_tpu.scene.parser import parse_string, tokenize

FOG_SCENE = """
# config-1-like scene
Integrator "photonbeam" "integer iterations" [ 2 ]
    "integer photonsperiteration" [ 200 ] "float initialbeamradius" [ 0.3 ]
Sampler "halton" "integer pixelsamples" 8
Film "image" "integer xresolution" [ 16 ] "integer yresolution" [ 16 ]
    "string filename" "out.pfm"
LookAt 0 0 -3.5   0 0 0   0 1 0
Camera "perspective" "float fov" 45

WorldBegin
MakeNamedMedium "fog" "string type" "homogeneous"
    "rgb sigma_a" [ .05 .05 .05 ] "rgb sigma_s" [ .4 .4 .4 ] "float g" 0.0
AttributeBegin
  MediumInterface "fog" ""
  Material "none"
  Shape "trianglemesh" "integer indices" [ 0 1 2 0 2 3 ]
      "point P" [ -1 -1 1   1 -1 1   1 1 1   -1 1 1 ]
AttributeEnd
AttributeBegin
  MediumInterface "" "fog"
  LightSource "point" "rgb I" [ 1 1 1 ]
AttributeEnd
AttributeBegin
  Translate 0 0 5
  Material "matte" "rgb Kd" [ .6 .5 .4 ]
  Shape "sphere" "float radius" 0.7
AttributeEnd
WorldEnd
"""


def test_tokenize_strings_and_comments():
    toks = tokenize('Shape "sphere" "float radius" [ 1.5 ] # comment\nTranslate 1 2 3')
    assert toks == ['Shape', '"sphere"', '"float radius"', '[', '1.5', ']',
                    'Translate', '1', '2', '3']


def test_parse_fog_scene():
    ps = parse_string(FOG_SCENE)
    assert ps.integrator_name == "photonbeam"
    assert ps.integrator_params["iterations"] == 2
    assert ps.width == 16 and ps.height == 16
    assert ps.filename == "out.pfm"
    s = ps.build()
    assert s.n_triangles == 2
    assert s.n_spheres == 1
    assert s.n_lights == 1
    assert s.n_media == 1
    np.testing.assert_allclose(np.asarray(s.media.sigma_s[0]), 0.4, atol=1e-6)
    # triangles are boundary-only with fog inside
    assert int(s.triangles.material[0]) == -1
    assert int(s.triangles.medium_inside[0]) == 0
    # the point light sits in the fog
    assert int(s.lights.medium[0]) == 0
    # sphere translated to z=5 with matte material
    np.testing.assert_allclose(np.asarray(s.spheres.center[0]), [0, 0, 5], atol=1e-5)
    assert int(s.spheres.material[0]) >= 0
    assert ps.camera is not None


def test_parse_area_light_and_attrib_stack():
    txt = """
    Film "image" "integer xresolution" 8 "integer yresolution" 8
    LookAt 0 0 -2  0 0 0  0 1 0
    Camera "perspective" "float fov" 60
    WorldBegin
    AttributeBegin
      AreaLightSource "diffuse" "rgb L" [ 2 2 2 ]
      Shape "sphere" "float radius" 0.5
    AttributeEnd
    Shape "sphere" "float radius" 1.0
    WorldEnd
    """
    ps = parse_string(txt)
    s = ps.build()
    assert s.n_lights == 1  # area light didn't leak past AttributeEnd
    assert s.n_spheres == 2
    assert int(s.spheres.area_light[0]) == 0
    assert int(s.spheres.area_light[1]) == -1


def test_cli_end_to_end(tmp_path):
    from bre_tpu.cli import main

    scene_file = tmp_path / "fog.pbrt"
    scene_file.write_text(FOG_SCENE)
    out = tmp_path / "render.pfm"
    rc = main([str(scene_file), "--outfile", str(out), "--quiet"])
    assert rc == 0
    from bre_tpu.io.image import read_pfm

    img = read_pfm(out)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all() and img.max() > 0


def test_named_medium_preset():
    """MakeNamedMedium "string preset": measured scattering table lookup
    (MakeMedium, src/core/medium.cpp:49-195 — preset overrides sigmas)."""
    import warnings as _warnings

    import numpy as np

    from bre_tpu.scene.parser import parse_string

    txt = """
    WorldBegin
    MakeNamedMedium "milk" "string type" "homogeneous" "string preset" "Lowfat Milk"
    MakeNamedMedium "bogus" "string type" "homogeneous" "string preset" "nope"
    WorldEnd
    """
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        scene = parse_string(txt).build()
        msgs = [str(x.message) for x in w]
    ss = np.asarray(scene.media.sigma_s)
    np.testing.assert_allclose(ss[0], [0.89187, 1.5136, 2.532], atol=1e-4)
    # unknown preset warns and keeps explicit/default sigmas
    assert any("nope" in m for m in msgs)
    np.testing.assert_allclose(ss[1], [1.0, 1.0, 1.0])


def test_film_crop_and_scale(tmp_path):
    """Film cropwindow/scale (film.cpp cropped pixel bounds + write scale)."""
    import numpy as np

    from bre_tpu.cli import main as cli_main
    from bre_tpu.io.image import read_image
    from bre_tpu.scene.parser import parse_string

    txt = """
    LookAt 0 0 -3  0 0 0  0 1 0
    Camera "perspective" "float fov" [45]
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
        "float cropwindow" [0.25 0.75 0.5 1.0] "float scale" [2.0]
    Integrator "volpath" "integer maxdepth" [2]
    Sampler "random" "integer pixelsamples" [2]
    WorldBegin
    LightSource "point" "point from" [0 0 -1] "rgb I" [5 5 5]
    Material "matte" "rgb Kd" [.7 .6 .5]
    Shape "sphere" "float radius" [0.5]
    WorldEnd
    """
    ps = parse_string(txt)
    assert ps.crop == (0.25, 0.75, 0.5, 1.0)
    assert ps.film_scale == 2.0

    scene_file = tmp_path / "crop.pbrt"
    scene_file.write_text(txt)
    out = tmp_path / "out.pfm"
    rc = cli_main([str(scene_file), "--outfile", str(out), "--quiet"])
    assert rc == 0
    img = np.asarray(read_image(str(out)))
    assert img.shape == (8, 8, 3)  # 16 * (0.75-0.25) x 16 * (1.0-0.5)


def test_max_sample_luminance_clamp():
    """Film "maxsampleluminance" clamps per-sample luminance before
    accumulation (Film::AddSample, film.h:~125)."""
    import numpy as np

    from bre_tpu.scene.parser import parse_string
    from bre_tpu.integrators.volpath import VolPathConfig, render_volpath

    txt = """
    LookAt 0 0 -3  0 0 0  0 1 0
    Camera "perspective" "float fov" [45]
    Film "image" "integer xresolution" [8] "integer yresolution" [8]
        "float maxsampleluminance" [0.05]
    WorldBegin
    LightSource "point" "point from" [0 0 -1] "rgb I" [50 50 50]
    Material "matte" "rgb Kd" [.7 .7 .7]
    Shape "sphere" "float radius" [0.5]
    WorldEnd
    """
    ps = parse_string(txt)
    assert ps.max_sample_luminance == 0.05
    scene = ps.build()
    img_c = np.asarray(render_volpath(
        scene, ps.camera, 8, 8,
        VolPathConfig(maxdepth=2, spp=4, maxsampleluminance=0.05)))
    img_u = np.asarray(render_volpath(
        scene, ps.camera, 8, 8, VolPathConfig(maxdepth=2, spp=4)))
    y_c = img_c @ np.array([0.212671, 0.715160, 0.072169])
    assert y_c.max() <= 0.05 + 1e-5
    assert img_u.max() > img_c.max()
