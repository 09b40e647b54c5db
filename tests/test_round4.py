"""Round-4 additions: figure scripts + roofline run headless end-to-end."""
import numpy as np

from research.scripts import lcd_wave, roofline, viz_goal


def test_viz_goal_writes_grid(tmp_path):
  viz_goal.main(['--env=Luxo', f'--outdir={tmp_path}', '--rows=1',
                 '--cols=2'])
  out = tmp_path / 'Luxo_goals.png'
  assert out.exists()
  from PIL import Image
  img = np.asarray(Image.open(out))
  assert img.ndim == 3 and img.shape[2] == 3
  # goal silhouette must actually be red-tinted somewhere: R > G pixels
  assert (img[..., 0].astype(int) > img[..., 1].astype(int) + 64).any()


def test_lcd_wave_writes_gif(tmp_path):
  lcd_wave.main(['--env=Bounce', '--steps=6', f'--outdir={tmp_path}'])
  assert (tmp_path / 'Bounce_wave.gif').exists()


def test_roofline_counts_flops(capsys):
  roofline.main(['--env=Dropbox', '--iters=8,4'])
  out = capsys.readouterr().out
  assert 'FLOPs/env-step' in out and 'compute-bound' in out
  # more solver iterations must count more FLOPs
  f1 = roofline.step_flops(__import__('boxlcd_tpu').env_map['Dropbox'](
      {'vel_iters': 8, 'pos_iters': 4}))
  f2 = roofline.step_flops(__import__('boxlcd_tpu').env_map['Dropbox'](
      {'vel_iters': 180, 'pos_iters': 60}))
  assert f2 > 5 * f1
