from .dict_fact import Coder, CodingMixin, DictFact
