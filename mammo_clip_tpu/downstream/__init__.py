from .classify import MammoClassifier, MammoEfficientNetClassifier, POS_WEIGHTS
