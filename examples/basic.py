"""Run an env and print LCD frames (reference: examples/basic.py)."""
import numpy as np

import boxlcd_tpu


def main():
  env = boxlcd_tpu.env_map['Bounce']()
  env.seed(0)
  obs = env.reset()
  for t in range(50):
    action = env.action_space.sample()
    obs, rew, done, info = env.step(action)
    if t % 10 == 0:
      frame = np.asarray(1 - obs['lcd'], int)
      print(f'--- t={t}')
      print('\n'.join(''.join('#' if v else '.' for v in row) for row in frame))


if __name__ == '__main__':
  main()
