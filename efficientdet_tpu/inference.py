"""Alias of :mod:`efficientdet_tpu.predict` under the reference's script name
(the reference exposes ``inference.py``; SURVEY.md SS2 "Inference demo")."""

from efficientdet_tpu.predict import Predictor, main

if __name__ == "__main__":
    main()
