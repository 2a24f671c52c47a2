from setuptools import find_packages, setup

setup(
    name='swindet_tpu',
    version='0.1.0',
    description='TPU-native Swin Transformer object detection framework '
                '(JAX/XLA/Pallas)',
    packages=find_packages(exclude=('tests', 'tools', 'demo', 'configs')),
    python_requires='>=3.10',
    install_requires=['jax', 'flax', 'optax', 'orbax-checkpoint', 'numpy'],
)
