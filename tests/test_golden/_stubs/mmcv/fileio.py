import json
import pickle


def load(path, file_format=None):
    fmt = file_format or str(path).rsplit('.', 1)[-1]
    if fmt == 'json':
        with open(path) as f:
            return json.load(f)
    if fmt in ('pkl', 'pickle'):
        with open(path, 'rb') as f:
            return pickle.load(f)
    raise ValueError(f'unsupported format {fmt}')


def dump(obj, path=None, file_format=None, **kwargs):
    fmt = file_format or str(path).rsplit('.', 1)[-1]
    if fmt == 'json':
        if path is None:
            return json.dumps(obj)
        with open(path, 'w') as f:
            json.dump(obj, f)
        return None
    if fmt in ('pkl', 'pickle'):
        with open(path, 'wb') as f:
            pickle.dump(obj, f)
        return None
    raise ValueError(f'unsupported format {fmt}')


class FileClient:
    def __init__(self, backend='disk', **kwargs):
        self.backend = backend

    def get(self, path):
        with open(path, 'rb') as f:
            return f.read()

    def get_text(self, path):
        with open(path) as f:
            return f.read()
