"""mmcv.image shim over cv2/numpy (only what golden paths touch)."""
import cv2
import numpy as np


def imread(path, flag='color'):
    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(path)
    return img


def imwrite(img, path):
    return cv2.imwrite(str(path), img)


def imfrombytes(content, flag='color'):
    arr = np.frombuffer(content, np.uint8)
    return cv2.imdecode(arr, cv2.IMREAD_COLOR)


def bgr2rgb(img):
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def rgb2bgr(img):
    return cv2.cvtColor(img, cv2.COLOR_RGB2BGR)


def imresize(img, size, return_scale=False, interpolation='bilinear'):
    interp = {'bilinear': cv2.INTER_LINEAR, 'nearest': cv2.INTER_NEAREST,
              'bicubic': cv2.INTER_CUBIC, 'area': cv2.INTER_AREA}
    resized = cv2.resize(img, size, interpolation=interp[interpolation])
    if not return_scale:
        return resized
    h, w = img.shape[:2]
    return resized, size[0] / w, size[1] / h


def imrescale(img, scale, return_scale=False, interpolation='bilinear'):
    h, w = img.shape[:2]
    if isinstance(scale, (float, int)):
        scale_factor = scale
    else:
        max_long, max_short = max(scale), min(scale)
        scale_factor = min(max_long / max(h, w), max_short / min(h, w))
    new_size = (int(w * scale_factor + 0.5), int(h * scale_factor + 0.5))
    rescaled = imresize(img, new_size, interpolation=interpolation)
    if return_scale:
        return rescaled, scale_factor
    return rescaled


def imflip(img, direction='horizontal'):
    if direction == 'horizontal':
        return np.flip(img, axis=1)
    if direction == 'vertical':
        return np.flip(img, axis=0)
    return np.flip(img, axis=(0, 1))


def impad(img, *, shape=None, padding=None, pad_val=0, padding_mode='constant'):
    if shape is not None:
        padding = (0, 0, shape[1] - img.shape[1], shape[0] - img.shape[0])
    out = cv2.copyMakeBorder(img, padding[1], padding[3], padding[0],
                             padding[2], cv2.BORDER_CONSTANT, value=pad_val)
    return out


def impad_to_multiple(img, divisor, pad_val=0):
    pad_h = int(np.ceil(img.shape[0] / divisor)) * divisor
    pad_w = int(np.ceil(img.shape[1] / divisor)) * divisor
    return impad(img, shape=(pad_h, pad_w), pad_val=pad_val)


def imnormalize(img, mean, std, to_rgb=True):
    img = img.astype(np.float32)
    if to_rgb:
        img = bgr2rgb(img)
    return (img - mean) / std


def imdenormalize(img, mean, std, to_bgr=True):
    img = img * std + mean
    if to_bgr:
        img = rgb2bgr(img.astype(np.float32))
    return img


def tensor2imgs(tensor, mean=(0, 0, 0), std=(1, 1, 1), to_rgb=True):
    mean = np.array(mean, dtype=np.float32)
    std = np.array(std, dtype=np.float32)
    imgs = []
    for t in tensor:
        img = t.detach().cpu().numpy().transpose(1, 2, 0)
        imgs.append(np.ascontiguousarray(
            imdenormalize(img, mean, std, to_bgr=to_rgb)).astype(np.uint8))
    return imgs


def imshow(img, win_name='', wait_time=0):
    pass
