"""Data layer: readers, transforms, datasets (all 32 reference registry names), loader."""

from . import common
from . import transforms
from .loader import DataLoader
from .datasets import (
    FlyingChairsTrain, FlyingChairsValid, FlyingChairsFull,
    FlyingChairsOccTrain, FlyingChairsOccValid, FlyingChairsOccFull,
    FlyingThings3dFinalTrain, FlyingThings3dFinalTest,
    FlyingThings3dCleanTrain, FlyingThings3dCleanTest,
    SintelTestClean, SintelTestFinal,
    SintelTrainingCombFull, SintelTrainingCombTrain, SintelTrainingCombValid,
    SintelTrainingCleanFull, SintelTrainingCleanTrain, SintelTrainingCleanValid,
    SintelTrainingFinalFull, SintelTrainingFinalTrain, SintelTrainingFinalValid,
    KittiCombTrain, KittiCombVal, KittiCombFull,
    KittiComb2012Train, KittiComb2012Val, KittiComb2012Full, KittiComb2012Test,
    KittiComb2015Train, KittiComb2015Val, KittiComb2015Full, KittiComb2015Test,
)
