from ..utils import Registry

HOOKS = Registry('hook')


class Hook:
    def before_run(self, runner):
        pass

    def after_run(self, runner):
        pass

    def before_epoch(self, runner):
        pass

    def after_epoch(self, runner):
        pass

    def before_iter(self, runner):
        pass

    def after_iter(self, runner):
        pass

    before_train_epoch = before_epoch
    after_train_epoch = after_epoch
    before_val_epoch = before_epoch
    after_val_epoch = after_epoch
    before_train_iter = before_iter
    after_train_iter = after_iter
    before_val_iter = before_iter
    after_val_iter = after_iter

    def every_n_epochs(self, runner, n):
        return (runner.epoch + 1) % n == 0 if n > 0 else False

    def every_n_iters(self, runner, n):
        return (runner.iter + 1) % n == 0 if n > 0 else False
