"""Command-line entry points.

python -m asvspoof2021_air_tpu.cli.train          (== main_train.py)
python -m asvspoof2021_air_tpu.cli.generate_score (== generate_score.py)
python -m asvspoof2021_air_tpu.cli.score_fusion   (== score_fusion.py)
python -m asvspoof2021_air_tpu.cli.evaluate_tdcf  (== evaluate_tDCF_asvspoof19.py)
python -m asvspoof2021_air_tpu.cli.preprocess     (== preprocess.py)
python -m asvspoof2021_air_tpu.cli.degrade        (== channel_simulation/*.py)
"""
