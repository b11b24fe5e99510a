from marconet_tpu.data.batch_prep import prepare_train_batch

__all__ = ["prepare_train_batch"]
