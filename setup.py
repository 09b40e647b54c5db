from setuptools import find_packages, setup

setup(
    name='boxlcd_tpu',
    version='0.1.0',
    description='TPU-native learned-simulator research testbed '
                '(box2D-style physics + binarized LCD rendering in JAX)',
    packages=find_packages(include=['boxlcd_tpu*', 'research*']),
    python_requires='>=3.10',
    install_requires=['jax', 'flax', 'optax', 'numpy', 'pyyaml'],
    extras_require={'test': ['pytest']},
)
