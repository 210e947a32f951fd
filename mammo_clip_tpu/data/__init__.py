from .prompts import build_prompt_bank, generate_report_from_labels, VINDR_FINDINGS
from .tokenizer import WordPieceTokenizer, HashTokenizer, load_tokenizer
