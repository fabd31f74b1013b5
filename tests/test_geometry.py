"""SVG / CSV geometry parser tests."""

import numpy as np
import pytest

from magnetite_tpu.errors import InputError
from magnetite_tpu.geometry.csv_geom import parse_csv
from magnetite_tpu.geometry.svg import parse_svg


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_svg_polygon_y_inverted(tmp_path):
    svg = _write(
        tmp_path,
        "a.svg",
        '<svg><polygon id="OUTER" points="0 0 10 0 10 5 0 5"/></svg>',
    )
    loops = parse_svg(svg, log=lambda m: None)
    assert len(loops) == 1
    np.testing.assert_allclose(
        loops[0], [[0, 0], [10, 0], [10, -5], [0, -5]]
    )


def test_svg_inner_outer_and_parent_id(tmp_path):
    svg = _write(
        tmp_path,
        "a.svg",
        """<svg>
        <g id="OUTER"><polygon points="0 0 10 0 10 10 0 10"/></g>
        <polygon id="INNER-2" points="2 2 4 2 4 4 2 4"/>
        <polygon id="ignored" points="100 100 101 100 101 101"/>
        </svg>""",
    )
    warnings = []
    loops = parse_svg(svg, log=warnings.append)
    assert len(loops) == 2  # outer + 1 inner; 'ignored' skipped with warning
    assert any("skipping" in w for w in warnings)


def test_svg_duplicate_outer_errors(tmp_path):
    svg = _write(
        tmp_path,
        "a.svg",
        '<svg><polygon id="OUTER" points="0 0 1 0 1 1"/>'
        '<polygon id="OUTER2" points="0 0 2 0 2 2"/></svg>',
    )
    with pytest.raises(InputError, match="Multiple OUTER"):
        parse_svg(svg, log=lambda m: None)


def test_svg_missing_id_errors(tmp_path):
    svg = _write(
        tmp_path, "a.svg", '<svg><polygon points="0 0 1 0 1 1"/></svg>'
    )
    with pytest.raises(InputError, match="Missing id"):
        parse_svg(svg, log=lambda m: None)


def test_svg_no_outer_errors(tmp_path):
    svg = _write(
        tmp_path,
        "a.svg",
        '<svg><polygon id="INNER" points="0 0 1 0 1 1"/></svg>',
    )
    with pytest.raises(InputError, match="No OUTER"):
        parse_svg(svg, log=lambda m: None)


def test_svg_missing_points_errors(tmp_path):
    svg = _write(tmp_path, "a.svg", '<svg><polygon id="OUTER"/></svg>')
    with pytest.raises(InputError, match="No points"):
        parse_svg(svg, log=lambda m: None)


def test_svg_dedup_and_min_length_filter(tmp_path):
    # duplicate vertex (5,5) dropped; (0.05, 0) within min length of (0,0)
    svg = _write(
        tmp_path,
        "a.svg",
        '<svg><polygon id="OUTER" '
        'points="0 0 0.05 0 5 0 5 5 5 5 0 5"/></svg>',
    )
    msgs = []
    loops = parse_svg(svg, min_element_length=0.1, log=msgs.append)
    assert loops[0].shape[0] == 4
    assert any("skipped 1 vertices" in m for m in msgs)


def test_svg_rect_parsing(tmp_path):
    svg = _write(
        tmp_path,
        "a.svg",
        '<svg><rect id="OUTER" x="1" y="2" width="4" height="3"/></svg>',
    )
    loops = parse_svg(svg, log=lambda m: None)
    np.testing.assert_allclose(
        loops[0], [[1, -2], [5, -2], [5, -5], [1, -5]]
    )


def test_svg_rect_defaults_xy_zero_with_warning(tmp_path):
    svg = _write(
        tmp_path,
        "a.svg",
        '<svg><rect id="OUTER" width="2" height="2"/></svg>',
    )
    warnings = []
    loops = parse_svg(svg, log=warnings.append)
    np.testing.assert_allclose(loops[0][0], [0, 0])
    assert sum("Assuming zero" in w for w in warnings) == 2


def test_svg_rect_missing_width_errors(tmp_path):
    svg = _write(
        tmp_path, "a.svg", '<svg><rect id="OUTER" height="2"/></svg>'
    )
    with pytest.raises(InputError, match="No width"):
        parse_svg(svg, log=lambda m: None)


def test_svg_namespaced_tags(tmp_path):
    svg = _write(
        tmp_path,
        "a.svg",
        '<svg xmlns="http://www.w3.org/2000/svg">'
        '<polygon id="OUTER" points="0,0 4,0 4,4 0,4"/></svg>',
    )
    loops = parse_svg(svg, log=lambda m: None)
    assert loops[0].shape == (4, 2)


def test_real_linkedin_svg():
    loops = parse_svg(
        "/root/reference/examples/linkedin-logo/linkedin.svg",
        min_element_length=3.0,
        log=lambda m: None,
    )
    assert len(loops) == 4  # OUTER + 3 INNER
    # y must be inverted (all svg y >= 0 -> all parsed y <= 0)
    assert loops[0][:, 1].max() <= 0.0


def test_csv_basic(tmp_path):
    path = _write(tmp_path, "v.csv", "x,y\n0,0\n1,0\n1,1\n0,1\n")
    verts = parse_csv(path)
    np.testing.assert_allclose(verts, [[0, 0], [1, 0], [1, 1], [0, 1]])


def test_csv_column_order_and_extras(tmp_path):
    path = _write(tmp_path, "v.csv", "label, y , x\n9,2,1\n9,4,3\n9,6,5\n")
    verts = parse_csv(path)
    np.testing.assert_allclose(verts, [[1, 2], [3, 4], [5, 6]])


def test_csv_missing_column_errors(tmp_path):
    path = _write(tmp_path, "v.csv", "x,z\n0,0\n")
    with pytest.raises(InputError, match="Missing x and/or y"):
        parse_csv(path)


def test_csv_real_tensile_example():
    verts = parse_csv("/root/reference/examples/tensile-example/vertices.csv")
    assert verts.shape == (66, 2)
    assert verts[0, 0] == -11.0 and verts[0, 1] == 4.5
