"""Entry points mirroring the reference scripts (SURVEY.md L6):

  python -m skyhdr.cli.dataset_generator   <->  datasetGenerator.py
  python -m skyhdr.cli.train_sun           <->  train_sun.py (pretrain/eval)
  python -m skyhdr.cli.train               <->  train.py (GAN)
  python -m skyhdr.cli.inference           <->  inference.py
  python -m skyhdr.cli.convert_real_eval   <->  convert_to_tf_record.py
  python -m skyhdr.cli.evaluate            —   metric harness (new)
"""
