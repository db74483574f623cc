"""Download the 24 canonical tfjs PoseNet test images.

Parity with the reference fetcher (/root/reference/get_test_images.py:5-46):
same bucket, same image list, same --image_dir flag. Offline environments
can pass --synthesize to generate placeholder images instead.
"""

import argparse
import os
import urllib.request

GOOGLE_CLOUD_IMAGE_BUCKET = 'https://storage.googleapis.com/tfjs-models/assets/posenet/'

TEST_IMAGES = [
    'frisbee.jpg',
    'frisbee_2.jpg',
    'backpackman.jpg',
    'boy_doughnut.jpg',
    'soccer.png',
    'with_computer.jpg',
    'snowboard.jpg',
    'person_bench.jpg',
    'skiing.jpg',
    'fire_hydrant.jpg',
    'kyte.jpg',
    'looking_at_computer.jpg',
    'tennis.jpg',
    'tennis_standing.jpg',
    'truck.jpg',
    'on_bus.jpg',
    'tie_with_beer.jpg',
    'baseball.jpg',
    'multi_skiing.jpg',
    'riding_elephant.jpg',
    'skate_park_venice.jpg',
    'skate_park.jpg',
    'tennis_in_crowd.jpg',
    'two_on_bench.jpg',
]


def synthesize(image_dir: str, size=(720, 1280)):
    """Offline fallback: deterministic random-noise JPEGs with the canonical
    names, so demo/benchmark CLIs have inputs in zero-egress environments."""
    import numpy as np
    import cv2

    rng = np.random.RandomState(0)
    for f in TEST_IMAGES:
        img = rng.randint(0, 255, size=(*size, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(image_dir, f), img)
        print('Synthesized %s' % f)


def download_images(image_dir: str):
    """Fetch all 24 canonical images into image_dir (reference
    get_test_images.py:39-46)."""
    os.makedirs(image_dir, exist_ok=True)
    for f in TEST_IMAGES:
        url = GOOGLE_CLOUD_IMAGE_BUCKET + f
        print('Downloading %s' % f)
        urllib.request.urlretrieve(url, os.path.join(image_dir, f))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--image_dir', type=str, default='./images')
    parser.add_argument('--synthesize', action='store_true')
    args = parser.parse_args()

    os.makedirs(args.image_dir, exist_ok=True)
    if args.synthesize:
        synthesize(args.image_dir)
        return
    download_images(args.image_dir)


if __name__ == "__main__":
    main()
