"""Drop-in API parity: gstools_core_spark.api reproduces the reference's
golden unit-test outputs through the Spark engine with the reference's own
call signatures (lib.rs:29-219)."""

import numpy as np

from gstools_core_spark import api
from tests.test_kernels_golden import (
    BIN_EDGES,
    COND,
    COV_SAMPLES,
    KRIG_MAT,
    KRIG_VECS,
    KRIGE_ERROR_WANT,
    KRIGE_FIELD_WANT,
    POS3,
    STRUCT_FIELD,
    UNSTRUCT_FIELD,
    UNSTRUCT_POS,
    Z1,
    Z2,
)

RTOL = 1e-9


def test_api_variogram_unstructured_golden(spark):
    gamma, counts = api.variogram_unstructured(UNSTRUCT_FIELD, BIN_EDGES, UNSTRUCT_POS)
    np.testing.assert_allclose(
        gamma, [0.14712242466045536, 0.320522186616688, 0.5136105328106929], rtol=RTOL
    )
    np.testing.assert_array_equal(counts, np.array([9, 8, 7], dtype=np.uint64))


def test_api_variogram_directional_golden(spark):
    direction = np.array([[0.0, np.pi], [0.0, 0.0]])
    gamma, counts = api.variogram_directional(
        UNSTRUCT_FIELD, BIN_EDGES, UNSTRUCT_POS, direction
    )
    np.testing.assert_allclose(
        gamma,
        [[0.14712242466045536, 0.320522186616688, 0.5136105328106929], [0, 0, 0]],
        rtol=RTOL,
    )
    np.testing.assert_array_equal(counts, [[9, 8, 7], [0, 0, 0]])


def test_api_variogram_structured_golden(spark):
    got = api.variogram_structured(STRUCT_FIELD)
    want = np.array([
        0.0, 0.49166666666666814, 0.7625000000000011, 1.090714285714288,
        0.9016666666666685, 1.3360000000000025, 0.9524999999999989,
        0.4349999999999996, 0.004999999999999788, 0.40500000000000513,
    ])
    np.testing.assert_allclose(got, want, rtol=RTOL)

    mask2 = np.zeros((10, 1), dtype=bool)
    mask2[0, 0] = True
    got_m = api.variogram_ma_structured(STRUCT_FIELD, mask2)
    np.testing.assert_allclose(
        got_m,
        [0.0, 0.4906250000000017, 0.710714285714287, 0.9391666666666693,
         0.9610000000000019, 0.6187499999999992, 0.5349999999999975,
         0.29249999999999765, 0.004999999999999432, 0.0],
        rtol=RTOL,
    )


def test_api_summate_golden(spark):
    got = api.summate(COV_SAMPLES, Z1, Z2, POS3)
    np.testing.assert_allclose(
        got,
        [0.3773130601113641, -4.298994445846448, 0.9285578931297425,
         0.893013192171638, -1.4956409956178418, -1.488542499264307,
         0.19211668257573278, 2.3427520079106143],
        rtol=RTOL,
    )


def test_api_summate_incompr_golden(spark):
    got = api.summate_incompr(COV_SAMPLES, Z1, Z2, POS3)
    assert got.shape == (3, 8)
    np.testing.assert_allclose(got[0, 0], 0.7026540940472319, rtol=1e-9)
    np.testing.assert_allclose(got[2, 7], 1.6593799470196355, rtol=1e-9)


def test_api_summate_fourier_golden(spark):
    sf = np.array([-2.15, 1.04, 0.69, -1.09, -1.54, -2.32, -1.81, -2.78, 1.57, -3.44])
    got = api.summate_fourier(sf, COV_SAMPLES, Z1, Z2, POS3)
    np.testing.assert_allclose(got[0], 1.0666558330143816, rtol=RTOL)
    np.testing.assert_allclose(got[7], -2.851408419726332, rtol=RTOL)


def test_api_krige_golden(spark):
    field = api.calc_field_krige(KRIG_MAT, KRIG_VECS, COND)
    np.testing.assert_allclose(field, KRIGE_FIELD_WANT, rtol=RTOL)
    field2, err = api.calc_field_krige_and_variance(KRIG_MAT, KRIG_VECS, COND)
    np.testing.assert_allclose(field2, KRIGE_FIELD_WANT, rtol=RTOL)
    np.testing.assert_allclose(err, KRIGE_ERROR_WANT, rtol=RTOL)
