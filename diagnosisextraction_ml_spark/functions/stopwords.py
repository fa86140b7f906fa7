"""Stopword lists (SURVEY.md §2.3 T6).

The Dutch list is the Snowball-project Dutch stopword list (public
domain; it is also what NLTK ships, which is what the reference loads
in notebook cell 23). Embedded so the engine has no NLTK dependency.
"""

DUTCH_STOPWORDS: tuple[str, ...] = (
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij",
    "het", "niet", "zijn", "is", "was", "op", "aan", "met", "als",
    "voor", "had", "er", "maar", "om", "hem", "dan", "zou", "of",
    "wat", "mijn", "men", "dit", "zo", "door", "over", "ze", "zich",
    "bij", "ook", "tot", "je", "mij", "uit", "der", "daar", "haar",
    "naar", "heb", "hoe", "heeft", "hebben", "deze", "u", "want",
    "nog", "zal", "me", "zij", "nu", "ge", "geen", "omdat", "iets",
    "worden", "toch", "al", "waren", "veel", "meer", "doen", "toen",
    "moet", "ben", "zonder", "kan", "hun", "dus", "alles", "onder",
    "ja", "eens", "hier", "wie", "werd", "altijd", "doch", "wordt",
    "wezen", "kunnen", "ons", "zelf", "tegen", "na", "reeds", "wil",
    "kon", "niets", "uw", "iemand", "geweest", "andere",
)

# Compact English list for the documents-table text-analysis operators
# (lang-id heuristics, quality scoring). Top function words only —
# enough signal for ratio features; not meant to match any library.
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "the", "of", "and", "a", "to", "in", "is", "it", "you", "that",
    "he", "was", "for", "on", "are", "with", "as", "his", "they",
    "be", "at", "one", "have", "this", "from", "or", "had", "by",
    "not", "but", "what", "all", "were", "we", "when", "your", "can",
    "said", "there", "use", "an", "each", "which", "she", "do",
    "how", "their", "if", "will", "up", "other", "about", "out",
    "many", "then", "them", "these", "so", "some", "her", "would",
    "like", "him", "into", "time", "has", "look", "two", "more",
    "no", "than", "its", "who", "did", "get", "may", "was", "i",
)
