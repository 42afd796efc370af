"""Guard: the sklearn calibration differential only proves parity against
the version it was run on.

The calibration differential tests (tests/train/test_calibration.py) pin
``train/calibration.py`` against whatever sklearn is installed; if sklearn's
``_SigmoidCalibration`` internals change, those tests would faithfully match
the WRONG semantics. This guard fails when the installed version drifts from
``PARITY_PROVEN_SKLEARN`` so the differential is consciously re-proven and
the pin bumped — the same discipline as the reference's sklearn pin gate
(reference: tests/pyspacer/test_sklearn_pin.py:13,
mermaid_classifier/pyspacer/inference/__init__.py:17) and this repo's jax
pin (inference/__init__.py PARITY_PROVEN_JAX).
"""

import unittest


class SklearnCalibrationPinTest(unittest.TestCase):
    def test_installed_sklearn_matches_proven_pin(self):
        import sklearn

        from mermaid_classifier_tpu.train.calibration import (
            PARITY_PROVEN_SKLEARN,
        )

        self.assertEqual(
            sklearn.__version__,
            PARITY_PROVEN_SKLEARN,
            "installed sklearn"
            f" {sklearn.__version__} != calibration parity pin"
            f" {PARITY_PROVEN_SKLEARN}. Re-run the calibration differential"
            " suite (tests/train/test_calibration.py), confirm"
            " fit_sigmoid_calibration still matches _SigmoidCalibration, and"
            " bump PARITY_PROVEN_SKLEARN in train/calibration.py.",
        )


if __name__ == "__main__":
    unittest.main()
