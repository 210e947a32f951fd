from .factor import FactorMapper, factor_loss, attribute_embeddings
